package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.harness.{FieldedQueries, Oracle, PipelineQueries, QuerySet, RelQueries, TextQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator claimed done in SURVEY.md §2 has a `queries` entry; the
  * SQL-expressible ones also have a DuckDB oracle in `oracleSql` with
  * identical column names. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * BM25 top-10 for "fast join merge" over the documents corpus. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.bm25TopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doc_tokens" -> TextQueries.docTokens _,
    "q_tf" -> TextQueries.tf _,
    "q_df" -> TextQueries.df _,
    "q_corpus_stats" -> TextQueries.corpusStats _,
    "q_bm25_topk" -> TextQueries.bm25TopK _,
    "q_bm25_queryset" -> TextQueries.bm25QuerySet _,
    "q_bm25_wand" -> TextQueries.bm25Wand _,
    "q_dedup_exact" -> TextQueries.dedupExact _,
    "q_dedup_lww" -> TextQueries.dedupLww _,
    "q_crossref_simplify" -> TextQueries.crossrefSimplify _,
    "q_crossref_dump" -> TextQueries.crossrefDump _,
    "q_crossref_gz" -> TextQueries.crossrefGz _,
    "q_lang_id" -> PipelineQueries.langId _,
    "q_quality" -> PipelineQueries.quality _,
    "q_token_count" -> PipelineQueries.tokenCount _,
    "q_fingerprint" -> PipelineQueries.fingerprint _,
    "q_dedup_ngram" -> PipelineQueries.dedupNgram _,
    "q_dedup_minhash" -> PipelineQueries.dedupMinhash _,
    "q_dedup_simhash" -> PipelineQueries.dedupSimhash _,
    "q_dedup_simhash_pairs" -> PipelineQueries.dedupSimhashPairs _,
    "q_dedup_cluster" -> PipelineQueries.dedupCluster _,
    "q_sample_stratified" -> PipelineQueries.sampleStratified _,
    "q_pack_budget" -> PipelineQueries.packBudget _,
    "q_ann_topk" -> PipelineQueries.annTopK _,
    "q_ann_pairs" -> PipelineQueries.annPairs _,
    "q_ann_lsh" -> PipelineQueries.annLsh _,
    "q_ann_ivf" -> PipelineQueries.annIvf _,
    "q_web_lww" -> WebQueries.webLww _,
    "q_web_df" -> WebQueries.webDf _,
    "q_media_features" -> PipelineQueries.mediaFeatures _,
    "q_pipeline_clean" -> PipelineQueries.pipelineClean _,
    "q_rel_agg" -> RelQueries.relAgg _,
    "q_rel_join" -> RelQueries.relJoin _,
    "q_rel_window" -> RelQueries.relWindow _,
    "q_rel_sessionize" -> RelQueries.relSessionize _,
    "q_rel_minsupp" -> RelQueries.relMinSupp _,
    "q_field_doi" -> FieldedQueries.fieldDoi _,
    "q_field_year" -> FieldedQueries.fieldYear _,
    "q_bm25_title" -> FieldedQueries.bm25Title _,
    "q_field_multi" -> FieldedQueries.fieldMulti _,
    "q_field_msm" -> FieldedQueries.fieldMsm _,
    "q_field_dismax" -> FieldedQueries.fieldDisMax _,
    "q_field_match_and" -> FieldedQueries.fieldMatchAnd _,
    "q_field_phrase" -> FieldedQueries.fieldPhrase _,
    "q_field_bool_phrase" -> FieldedQueries.fieldBoolPhrase _,
    "q_field_bool_full" -> FieldedQueries.fieldBoolFull _,
    "q_field_terms_agg" -> FieldedQueries.fieldTermsAgg _,
    "q_field_fuzzy" -> FieldedQueries.fieldFuzzy _,
    "q_field_exists" -> FieldedQueries.fieldExists _,
    "q_field_filtered" -> FieldedQueries.fieldFiltered _,
    "q_web_host" -> WebQueries.webHost _,
    "q_quality_rep" -> PipelineQueries.qualityRepetition _,
    "q_dedup_chunk" -> PipelineQueries.dedupChunk _,
    "q_decontaminate" -> PipelineQueries.decontaminate _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_doc_tokens" -> Oracle.docTokensSql,
    "q_tf" -> Oracle.tfSql,
    "q_df" -> Oracle.dfSql,
    "q_corpus_stats" -> Oracle.corpusStatsSql,
    "q_bm25_topk" -> Oracle.topkSql(QuerySet.flagshipTerms, QuerySet.K),
    "q_bm25_queryset" -> Oracle.topkSql(QuerySet.terms, QuerySet.K),
    "q_bm25_wand" -> Oracle.topkSql(QuerySet.terms, QuerySet.K),
    "q_dedup_exact" -> Oracle.dedupExactSql,
    "q_dedup_lww" -> Oracle.dedupLwwSql,
    "q_crossref_simplify" -> Oracle.crossrefSimplifySql,
    "q_crossref_dump" -> Oracle.crossrefDumpSql,
    "q_crossref_gz" -> Oracle.crossrefGzSql,
    "q_lang_id" -> PipelineQueries.langIdSql,
    "q_quality" -> PipelineQueries.qualitySql,
    "q_token_count" -> PipelineQueries.tokenCountSql,
    "q_fingerprint" -> PipelineQueries.fingerprintSql,
    "q_dedup_ngram" -> PipelineQueries.dedupNgramSql,
    "q_dedup_minhash" -> PipelineQueries.dedupMinhashSql,
    "q_dedup_simhash" -> PipelineQueries.dedupSimhashSql,
    "q_dedup_simhash_pairs" -> PipelineQueries.dedupSimhashPairsSql,
    "q_dedup_cluster" -> PipelineQueries.dedupClusterSql,
    "q_sample_stratified" -> PipelineQueries.sampleStratifiedSql,
    "q_pack_budget" -> PipelineQueries.packBudgetSql,
    "q_ann_topk" -> PipelineQueries.annTopKSql,
    "q_ann_pairs" -> PipelineQueries.annPairsSql,
    "q_ann_lsh" -> PipelineQueries.annLshSql,
    "q_ann_ivf" -> PipelineQueries.annIvfSql,
    "q_web_lww" -> WebQueries.webLwwSql,
    "q_web_df" -> WebQueries.webDfSql,
    "q_media_features" -> PipelineQueries.mediaFeaturesSql,
    "q_pipeline_clean" -> PipelineQueries.pipelineCleanSql,
    "q_rel_agg" -> RelQueries.relAggSql,
    "q_rel_join" -> RelQueries.relJoinSql,
    "q_rel_window" -> RelQueries.relWindowSql,
    "q_rel_sessionize" -> RelQueries.relSessionizeSql,
    "q_rel_minsupp" -> RelQueries.relMinSuppSql,
    "q_field_doi" -> FieldedQueries.fieldDoiSql,
    "q_field_year" -> FieldedQueries.fieldYearSql,
    "q_bm25_title" -> FieldedQueries.bm25TitleSql,
    "q_field_multi" -> FieldedQueries.fieldMultiSql,
    "q_field_msm" -> FieldedQueries.fieldMsmSql,
    "q_field_dismax" -> FieldedQueries.fieldDisMaxSql,
    "q_field_match_and" -> FieldedQueries.fieldMatchAndSql,
    "q_field_phrase" -> FieldedQueries.fieldPhraseSql,
    "q_field_bool_phrase" -> FieldedQueries.fieldBoolPhraseSql,
    "q_field_bool_full" -> FieldedQueries.fieldBoolFullSql,
    "q_field_terms_agg" -> FieldedQueries.fieldTermsAggSql,
    "q_field_fuzzy" -> FieldedQueries.fieldFuzzySql,
    "q_field_exists" -> FieldedQueries.fieldExistsSql,
    "q_field_filtered" -> FieldedQueries.fieldFilteredSql,
    "q_web_host" -> WebQueries.webHostSql,
    "q_quality_rep" -> PipelineQueries.qualityRepetitionSql,
    "q_dedup_chunk" -> PipelineQueries.dedupChunkSql,
    "q_decontaminate" -> PipelineQueries.decontaminateSql,
  )
}
