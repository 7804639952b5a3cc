package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analysis.Analyzer
import graft.query.Bm25

/** Catalyst-native index statistics + exact BM25 scoring over a corpus
  * DataFrame with columns (doc_id: long, text: string).
  *
  * This is the declarative "slice 2" of the build plan (SURVEY.md §7.2): every
  * stage here is a plain DataFrame op — explode, hash-aggregate with map-side
  * partial aggregation, broadcast join — so Catalyst handles pushdown,
  * pruning, partial aggs and AQE. It serves two roles:
  *  1. the rank-identity oracle that the compressed-postings / block-max-WAND
  *     path (PostingsBuilder / BlockMaxWand) must match exactly;
  *  2. the DuckDB-checkable query surface exposed via SparkEntry.
  *
  * Scale notes (100 TB design): tokenization is a narrow map; tf is one
  * shuffle on (term, doc_id) with partial aggregation; df reuses the tf
  * output's (term) grouping — at 10^12 docs these stay a single exact
  * shuffle each per the north_rule ("exact via Catalyst aggregates"). Query
  * scoring broadcasts the tiny query-term relation, never the corpus.
  */
object TextIndex {

  /** Analysis chain as a UDF (kept for API compat) and as the native
    * Catalyst expression [[graft.analysis.AnalyzeStopExpr]] — both call the
    * exact same [[Analyzer.analyzeStop]], which also generates the golden
    * test outputs, so semantics are identical; the expression variant stays
    * inside whole-stage codegen (SURVEY §2.12 perf-tier upgrade). */
  val analyzeStopUdf = udf((s: String) => Analyzer.analyzeStop(s))
  val analyzeUdf = udf((s: String) => Analyzer.analyze(s))

  def analyzeStopCol(c: Column): Column =
    graft.analysis.AnalyzeStopExpr.analyzeStop(c)

  /** (doc_id, pos, term) token stream after the stopword analysis chain. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(analyzeStopCol(col("text"))).as(Seq("pos", "term")))

  /** Exact term frequency per (term, doc_id). One shuffle, partial-agg'd.
    * This is the declarative/oracle formulation; the index build uses the
    * shuffle-free [[docTermFreqs]] (IndexSpec asserts their equality). */
  def termFreqs(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** Per-doc (doc_id[, carried cols], dl, tfs: array<struct<term,tf>>) in
    * ONE narrow pass — tf is document-local, so it is computed as a
    * row-local fold ([[graft.analysis.AnalyzeTfExpr]]) and the token
    * stream never shuffles. `carry` columns (e.g. the external doc key)
    * ride through into the staged doc_terms row so derivations like
    * doc_map become column-pruned PROJECTIONS of doc_terms instead of a
    * corpus×corpus join (measured 76-86 s of overlapped join work at 9.6M
    * docs); downstream readers prune the carried columns away. */
  def docTermFreqs(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs.select((col("doc_id") +: carry.map(col)) :+
        graft.analysis.AnalyzeTfExpr.analyzeTf(col("text")).as("at"): _*)
      .select((col("doc_id") +: carry.map(col)) :+
        col("at.dl").cast("long").as("dl") :+ col("at.tfs").as("tfs"): _*)

  /** The per-FIELD twin: docs carry (doc_id, vals: array<string>) and the
    * chain is one of [[Analyzer.Chains]] — same row-local shape, so every
    * field build keeps the zero-token-shuffle property. */
  def fieldDocTermFreqs(docs: DataFrame, kind: String): DataFrame =
    docs.select(col("doc_id"),
      graft.analysis.FieldTfExpr.analyzeTf(col("vals"), kind).as("at"))
      .select(col("doc_id"), col("at.dl").cast("long").as("dl"),
        col("at.tfs").as("tfs"))

  /** Exact document frequency per term, derived from the (term, doc_id)
    * grouping — north_rule forbids approx_count_distinct. */
  def docFreqs(termFreqs: DataFrame): DataFrame =
    termFreqs.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Exact per-doc token count (dl), including zero-token docs. */
  def docLens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(analyzeStopCol(col("text"))).cast("long").as("dl"))

  /** Exact corpus stats (N, avgdl) — one row. dl sums are integral so the
    * double avg is exact (< 2^53), making it bit-reproducible across engines. */
  def corpusStats(docLens: DataFrame): DataFrame =
    docLens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
      sum(col("dl")).cast("long").as("total_dl"))

  /** BM25 per-(term,doc) contribution as a Catalyst column. Parenthesization
    * deliberately mirrors the DuckDB oracle SQL so per-term doubles are
    * bit-comparable. */
  def bm25Col(tf: Column, df: Column, nDocs: Column, dl: Column, avgdl: Column): Column =
    log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5))) *
      (tf / (tf + lit(Bm25.K1) * (lit(1.0) - lit(Bm25.B) + lit(Bm25.B) * dl / avgdl)))

  /** Score a set of analyzed queries (qid, term — duplicates meaningful, as in
    * Lucene a repeated query term contributes once per occurrence) against the
    * corpus; returns (qid, doc_id, score). The query relation is broadcast.
    *
    * Shuffle census (optimization guide §2.3/§2.4): tf is DOCUMENT-LOCAL, so
    * the per-doc (term, tf) relation comes from the row-local
    * [[graft.analysis.AnalyzeTfExpr]] kernel filtered to the query's terms —
    * the corpus-wide (term, doc_id) aggregation exchange AND the corpus-sized
    * tf⋈dl join of the former formulation both disappear (dl rides in the
    * same row). df restricted to query terms falls out of the same filtered
    * relation (count per term = docs containing the term — identical to the
    * full-vocabulary df for those terms). Remaining corpus-sized work is
    * three narrow scans — the score probe, the df aggregation's own scan
    * (its subtree shares no exchange with the probe, so the tf kernel runs
    * twice), and the stats pass — with only query-sized exchanges; the
    * former plan's corpus-wide (term, doc_id) aggregation exchange and
    * corpus-sized dl broadcast are gone. Rank-identity with the previous
    * formulation is oracle-gated (q_bm25_topk / q_bm25_queryset). */
  def scoreQueries(spark: SparkSession, docs: DataFrame,
                   queryTerms: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    val q = queryTerms.toDF("qid", "term")
    val qTerms = queryTerms.map(_._2).distinct
    // row-local: per-doc tf entries restricted to query terms, dl attached
    val tfq = docTermFreqs(docs)
      .select(col("doc_id"), col("dl"),
        explode(filter(col("tfs"),
          t => t.getField("term").isInCollection(qTerms))).as("t"))
      .select(col("doc_id"), col("dl"), col("t.term").as("term"),
        col("t.tf").cast("long").as("tf"))
    // df over query terms only: one small aggregation of the filtered rows
    val dfT = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = corpusStats(docLens(docs))
    tfq.join(broadcast(q), "term")
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(bm25Col(col("tf"), col("df"), col("n_docs"), col("dl"),
        col("avgdl"))).as("score"))
  }

  /** Deterministic micro-unit rounding used for all cross-engine float
    * comparison (ULP noise from differing FP sum orders must not flip ranks,
    * so ranking uses the rounded value too). */
  def microRound(c: Column): Column = round(c * lit(1000000.0)).cast("long")

  /** Top-k per query with deterministic tie-break (rounded score desc,
    * doc_id asc): (qid, rnk, doc_id, score_x6). */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val sx = microRound(col("score")).as("score_x6")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_x6").desc, col("doc_id").asc)
    scored.select(col("qid"), col("doc_id"), sx)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      // BIGINT on both engines (DuckDB row_number returns BIGINT)
      .select(col("qid").cast("long").as("qid"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score_x6"))
      .orderBy(col("qid"), col("rnk"))
  }
}
