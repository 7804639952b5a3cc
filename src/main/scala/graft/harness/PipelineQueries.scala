package graft.harness

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps

/** Spark side of the training-data-pipeline operators (dedup / similarity /
  * text analysis) + their DuckDB oracle SQL. Thresholds and hash constants
  * are shared between both sides by construction. */
object PipelineQueries {

  val JaccardThr = 0.2
  val CosineThr = 0.4
  val AnnQueryVec = 0L
  val AnnK = 10

  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")
  private def emb(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/embeddings.parquet")

  // ---- Spark query fns ----------------------------------------------------

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(spark, dir))

  def quality(spark: SparkSession, dir: String): DataFrame =
    TextOps.quality(docs(spark, dir))

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenCount(docs(spark, dir))

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextOps.fingerprint(docs(spark, dir))

  def dedupNgram(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(spark, dir), JaccardThr)

  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLshPairs(docs(spark, dir), JaccardThr)

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHash(docs(spark, dir))

  def annTopK(spark: SparkSession, dir: String): DataFrame =
    Ann.bruteTopK(emb(spark, dir), AnnQueryVec, AnnK)

  def annPairs(spark: SparkSession, dir: String): DataFrame =
    Ann.nearDupPairs(emb(spark, dir), CosineThr)

  /** LSH-bucketed ANN — the bucketing is exact integer-seeded arithmetic,
    * so the "approximate" algorithm is still DETERMINISTIC and the oracle
    * replays it bit-for-bit (planes embedded as integer literals in
    * [[annLshSql]]); recall vs bruteTopK additionally asserted in
    * PipelineSpec. */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Ann.lshTopK(emb(spark, dir), AnnQueryVec, AnnK)

  /** SimHash near-dup pairs (exact at hamming ≤ 3 — see
    * [[graft.dedup.Dedup.simHashPairs]]). */
  def dedupSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(docs(spark, dir))

  lazy val dedupSimhashPairsSql: String =
    s"""WITH sigs AS (SELECT * FROM ($dedupSimhashSql)),
       |bands AS (SELECT doc_id, simhash AS sig, b.i AS band,
       |            (simhash >> (CAST(b.i AS INTEGER) * ${Dedup.SimBandBits}))
       |              & ${(1L << Dedup.SimBandBits) - 1} AS bv
       |          FROM sigs, unnest(range(0, ${Dedup.SimBands})) AS b(i)),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
       |                x.sig AS a_sig, y.sig AS b_sig
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
       |SELECT a_id, b_id, bit_count(xor(a_sig, b_sig))::BIGINT AS hamming
       |FROM cand WHERE bit_count(xor(a_sig, b_sig)) <= ${Dedup.SimHamMax}
       |ORDER BY a_id, b_id""".stripMargin

  /** Per-language keep rates (micro-units) for the deterministic stratified
    * sampler — the training-data MIXING op (downweight the head language,
    * keep the tails): keep iff polyHash(text) mod 10^6 < rate(lang). The
    * decision is a pure function of the text bytes, so the sample is
    * reproducible across runs, engines, and partitionings — no RNG state,
    * no seed plumbing, no sampleBy approximation. */
  val SampleRatesX6: Seq[(String, Long)] = Seq(
    "en" -> 300000L, "de" -> 800000L, "es" -> 800000L,
    "fr" -> 800000L, "zh" -> 1000000L)

  /** Deterministic stratified sampling by language: row-local hash gate
    * (codegen), no shuffle at all — the 100-TB shape is a filter fused
    * into the scan. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = SampleRatesX6.foldLeft(lit(0L)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs(spark, dir)
      .filter(pmod(graft.text.HashExpressions.polyHash(col("text")),
        lit(1000000L)) < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  lazy val sampleStratifiedSql: String = {
    val rateCase = SampleRatesX6.map { case (l, r) =>
      s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${ph("text")} % 1000000 < (CASE $rateCase ELSE 0 END)
       |ORDER BY doc_id""".stripMargin
  }

  /** Token budget per training pack (see [[packBudget]]). */
  val PackBudgetTokens = 1000L

  /** Docs per prefix-sum bucket (see [[packBudget]]). */
  val PackBucketDocs = 100000L

  /** Greedy token-budget packing: assign docs (in doc_id order, per
    * language) to training shards so each pack holds ~budget tokens —
    * pack_id = floor(running-token-sum-before / budget).
    *
    * The running sum is an EXPLICIT two-pass prefix sum, not a naive
    * `Window.partitionBy(lang)` (which routes each language's ENTIRE
    * corpus through one task — the head language serializes the job at
    * scale): pass 1 computes within-bucket running sums under
    * (lang, doc_id div bucket) — parallelism = languages × buckets — and
    * bucket totals; pass 2 runs the running sum over BUCKET TOTALS per
    * language (rows = buckets, driver-tiny) and joins the offsets back
    * (AQE broadcasts the tiny side). Bucket index is monotone in doc_id,
    * so the decomposition reproduces the single-window result exactly —
    * the DuckDB oracle replays the naive one-window formulation. */
  def packBudget(spark: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val withBucket = docs(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ", -1)).cast("long"))
      .withColumn("bucket", expr(s"doc_id div $PackBucketDocs"))
    val wIn = W.partitionBy(col("lang"), col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    val within = withBucket
      .withColumn("w_before", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    val wOff = W.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, -1)
    val offsets = withBucket.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btot"))
      .withColumn("b_off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select(col("lang"), col("bucket"), col("b_off"))
    within.join(offsets, Seq("lang", "bucket"))
      .withColumn("before", col("w_before") + col("b_off"))
      .select(col("doc_id"), col("lang"),
        // integer `div`, not `/`: the double divide can land 1 ulp low and
        // truncate into the wrong pack (the DuckDB side floor-divides)
        expr(s"before div $PackBudgetTokens").as("pack_id"),
        col("n_tokens"))
      .orderBy("doc_id")
  }

  lazy val packBudgetSql: String =
    s"""WITH t AS (SELECT doc_id, lang,
       |    len(string_split(text, ' '))::BIGINT AS n_tokens FROM documents),
       |c AS (SELECT doc_id, lang, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS before
       |  FROM t)
       |SELECT doc_id, lang, before // $PackBudgetTokens AS pack_id, n_tokens
       |FROM c ORDER BY doc_id""".stripMargin

  /** Duplicate clusters over the SimHash pair graph: (doc_id, cluster_id =
    * min member) for every doc in a near-dup pair — the keep-one-
    * representative key of a dedup pipeline. */
  def dedupCluster(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(Dedup.simHashPairs(docs(spark, dir)))

  /** Recursive-CTE replay: transitive closure of min labels over the same
    * symmetrized pair graph (UNION dedups, so the recursion reaches a
    * fixed point), then min per node. */
  lazy val dedupClusterSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM ($dedupSimhashPairsSql)),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |          UNION ALL SELECT b_id, a_id FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst AS id, r.lbl FROM reach r JOIN edges e ON e.src = r.id
       |)
       |SELECT id AS doc_id, min(lbl)::BIGINT AS cluster_id
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** Non-overlapping chunk width (tokens) for sub-document exact dedup. */
  val ChunkTokens = 16

  /** Sub-document exact dedup at fixed 16-token chunk granularity — the
    * hash-keyed variant of paragraph/boilerplate dedup (Lee et al. 2021 run
    * suffix arrays; production pipelines hash paragraph units — this corpus
    * has no newlines, so the deterministic unit is the fixed-width token
    * chunk). Chunk hashes come from one row-local codegen pass
    * ([[graft.text.HashKernels.gramHashes]], stride = width, trailing
    * partial kept), so the ONLY shuffle is the winner window over
    * `(cid, doc_id, k)` rows — ~24 bytes per chunk at 10^12 docs, never the
    * text itself. Output: every dropped occurrence (global keep-first by
    * (doc_id, chunk_idx)). */
  def dedupChunk(spark: SparkSession, dir: String): DataFrame =
    dedupChunkDf(docs(spark, dir))

  def dedupChunkDf(d: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val chunks = d.select(col("doc_id"),
      posexplode(graft.text.HashExpressions.gramHashes(
        col("text"), ChunkTokens, ChunkTokens, partial = true)).as(Seq("k", "cid")))
    chunks
      .withColumn("rn",
        row_number().over(W.partitionBy(col("cid")).orderBy(col("doc_id"), col("k"))))
      .filter(col("rn") > 1)
      .select(col("doc_id"), col("k").cast("long").as("k"), col("cid"))
      .orderBy("doc_id", "k")
  }

  lazy val dedupChunkSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, CAST(i AS BIGINT) AS k,
       |        array_to_string(toks[CAST(i*$ChunkTokens+1 AS INT):CAST(LEAST(len(toks), i*$ChunkTokens+$ChunkTokens) AS INT)], ' ') AS chunk
       |      FROM t, unnest(range(0, (len(toks)-1)//$ChunkTokens + 1)) AS r(i)),
       |h AS (SELECT doc_id, k, ${ph("chunk")} AS cid FROM c),
       |rn AS (SELECT doc_id, k, cid,
       |         row_number() OVER (PARTITION BY cid ORDER BY doc_id, k) AS rn FROM h)
       |SELECT doc_id, k, cid FROM rn WHERE rn > 1 ORDER BY doc_id, k""".stripMargin

  /** Chunk-dedup REWRITE — the dedup ACTION on top of [[dedupChunk]]'s
    * detection: each doc's text re-emitted with globally-duplicate chunks
    * removed (keep-first by (doc_id, chunk_idx)). The loser set (only the
    * duplicate occurrences — bounded by the corpus's duplication mass,
    * tiny on a clean corpus) folds to a per-doc drop-index array and joins
    * back; the rebuild is then ROW-LOCAL — token-array slicing with an
    * index-filtered transform — so document text never shuffles; only
    * ~24-byte hash rows and the small drop lists move. */
  def dedupChunkRewrite(spark: SparkSession, dir: String): DataFrame =
    dedupChunkRewriteDf(docs(spark, dir))

  def dedupChunkRewriteDf(d: DataFrame): DataFrame = {
    val losers = dedupChunkDf(d)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("k").cast("int")).as("drop_ks"))
    val toks = split(col("text"), " ")
    // integer floor-division chunk count (the double `/` would poison
    // sequence()'s integral bound)
    val nchunks =
      floor((size(toks) - 1) / lit(ChunkTokens)).cast("int") + lit(1)
    val chunks = transform(sequence(lit(0), nchunks - 1),
      i => array_join(slice(toks, i * ChunkTokens + 1, lit(ChunkTokens)), " "))
    d.join(losers, Seq("doc_id"), "left")
      .withColumn("dk", coalesce(col("drop_ks"), array()))
      .select(col("doc_id"),
        array_join(filter(chunks, (_, i) => !array_contains(col("dk"), i)),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  lazy val dedupChunkRewriteSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |c AS (SELECT doc_id, CAST(i AS BIGINT) AS k,
       |        array_to_string(toks[CAST(i*$ChunkTokens+1 AS INT):CAST(LEAST(len(toks), i*$ChunkTokens+$ChunkTokens) AS INT)], ' ') AS chunk
       |      FROM t, unnest(range(0, (len(toks)-1)//$ChunkTokens + 1)) AS r(i)),
       |h AS (SELECT doc_id, k, chunk, ${ph("chunk")} AS cid FROM c),
       |rn AS (SELECT doc_id, k, chunk,
       |         row_number() OVER (PARTITION BY cid ORDER BY doc_id, k) AS rn FROM h),
       |kept AS (SELECT doc_id, k, chunk FROM rn WHERE rn = 1)
       |SELECT d.doc_id,
       |       coalesce(string_agg(kept.chunk, ' ' ORDER BY kept.k), '') AS clean_text
       |FROM documents d LEFT JOIN kept ON kept.doc_id = d.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** Eval-set membership modulus and overlap-gram width for decontamination. */
  val DecontEvalMod = 97
  val DecontGramN = 5

  /** Benchmark decontamination: flag training docs sharing any word 5-gram
    * with the held-out eval subset (doc_id ≡ 0 mod 97 stands in for the
    * benchmark corpus — in production the eval grams come from a separate
    * small table). The 100-TB shape: eval n-gram sets are tiny (benchmarks
    * are MBs), so the overlap test is an explicitly-broadcast semi-join
    * against the training side's row-local distinct-gram hashes — the
    * training corpus is scanned once, nothing corpus-sized shuffles. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateDf(docs(spark, dir))

  def decontaminateDf(d: DataFrame): DataFrame = {
    val g = d.select(col("doc_id"),
      explode(array_distinct(graft.text.HashExpressions.gramHashes(
        col("text"), DecontGramN, 1, partial = false))).as("gid"))
    val evalGrams = g.filter(col("doc_id") % DecontEvalMod === 0)
      .select("gid").distinct()
    g.filter(col("doc_id") % DecontEvalMod =!= 0)
      .join(broadcast(evalGrams), "gid")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  lazy val decontaminateSql: String = {
    val terms = (0 until DecontGramN)
      .map(j => s"toks[CAST(i+$j AS INT)]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |g0 AS (SELECT doc_id, $terms AS gram
       |       FROM t, unnest(range(1, len(toks)-${DecontGramN - 2})) AS r(i)
       |       WHERE len(toks) >= $DecontGramN),
       |g AS (SELECT DISTINCT doc_id, ${ph("gram")} AS gid FROM g0),
       |e AS (SELECT DISTINCT gid FROM g WHERE doc_id % $DecontEvalMod = 0)
       |SELECT doc_id, count(*)::BIGINT AS n_overlap
       |FROM g WHERE doc_id % $DecontEvalMod <> 0 AND gid IN (SELECT gid FROM e)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val RepKeyBase = 1099511627776L // 2^40 — mass rides the low bits

  /** Gopher-style repetition quality metrics (Rae et al. 2021 §A1.1 rule
    * family): per doc, the character-mass fraction of the most-repeated
    * word 1/2/3-gram and the total mass of duplicated 3-grams — the
    * filters that kill boilerplate/template pages at scale. One row-local
    * codegen kernel pass ([[graft.text.HashKernels.repStats]]): zero
    * shuffles up to presentation; fractions are micro-unit longs. */
  def qualityRepetition(spark: SparkSession, dir: String): DataFrame =
    qualityRepetitionDf(docs(spark, dir))

  def qualityRepetitionDf(d: DataFrame): DataFrame = {
    def frac(mass: Column): Column =
      when(col("n_chars") === 0L, lit(0L)).otherwise(
        round(mass.cast("double") * 1e6 / col("n_chars")).cast("long"))
    d
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        graft.text.HashExpressions.repStats(col("text")).as("st"))
      .select(col("doc_id"),
        frac(element_at(col("st"), 1) % RepKeyBase).as("top1_frac_x6"),
        frac(element_at(col("st"), 2) % RepKeyBase).as("top2_frac_x6"),
        frac(element_at(col("st"), 3) % RepKeyBase).as("top3_frac_x6"),
        frac(element_at(col("st"), 4)).as("dup3_frac_x6"))
      .orderBy("doc_id")
  }

  lazy val qualityRepetitionSql: String = {
    def gramCte(n: Int): String = {
      val terms = (0 until n).map(j => s"toks[CAST(i+$j AS INT)]").mkString(" || ' ' || ")
      s"""g$n AS (SELECT doc_id, $terms AS gram
         |       FROM t, unnest(range(1, len(toks) - (${n - 2}))) AS r(i)
         |       WHERE len(toks) >= $n)""".stripMargin
    }
    def hCte(n: Int): String =
      s"""h$n AS (SELECT doc_id, ${ph("gram")} AS hid, count(*)::BIGINT AS c,
         |         sum(length(gram))::BIGINT AS m FROM g$n GROUP BY 1, 2)""".stripMargin
    def kCte(n: Int): String =
      s"k$n AS (SELECT doc_id, max(c * $RepKeyBase + m) AS key FROM h$n GROUP BY doc_id)"
    def frac(v: String): String =
      s"CASE WHEN n_chars = 0 OR $v IS NULL THEN 0 ELSE CAST(round($v * 1000000.0 / n_chars) AS BIGINT) END"
    s"""WITH t AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
       |            string_split(text, ' ') AS toks FROM documents),
       |${gramCte(1)},
       |${gramCte(2)},
       |${gramCte(3)},
       |${hCte(1)},
       |${hCte(2)},
       |${hCte(3)},
       |${kCte(1)},
       |${kCte(2)},
       |${kCte(3)},
       |d3 AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN m ELSE 0 END)::BIGINT AS m
       |       FROM h3 GROUP BY doc_id)
       |SELECT t.doc_id,
       |  ${frac(s"(k1.key % $RepKeyBase)")} AS top1_frac_x6,
       |  ${frac(s"(k2.key % $RepKeyBase)")} AS top2_frac_x6,
       |  ${frac(s"(k3.key % $RepKeyBase)")} AS top3_frac_x6,
       |  ${frac("d3.m")} AS dup3_frac_x6
       |FROM t JOIN k1 USING (doc_id) LEFT JOIN k2 USING (doc_id)
       |  LEFT JOIN k3 USING (doc_id) LEFT JOIN d3 USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  val CleanMinTokens = 20
  val CleanMinUniqX6 = 400000L

  /** The composed training-data cleaning pipeline — the end-to-end shape
    * the individual operators exist FOR: language gate ∧ quality gates ∧
    * exact-dedup winner, in one declarative plan. Scale shape: lang/quality
    * are row-local codegen kernels, the dedup winner is one groupBy (hash
    * of the text bytes at 10^12 docs — min-doc-id-per-text here for the
    * oracle), and the id joins co-partition on doc_id. Catalyst fuses the
    * row-local gates into the scan-side stage. */
  def pipelineClean(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // round-6 fusion (guide §2.4): lang/quality are row-local expressions
    // over the same scan, so they compute IN ONE projection (shared
    // TextOps column builders — identical values to the standalone ops)
    // and filter before the single dedup-winner join — the former
    // three-join chain shuffled the corpus-keyed (doc_id) relation three
    // times to attach columns the scan already had.
    val toks = split(col("text"), " ")
    val winners = d.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    d.select(col("doc_id"),
        TextOps.langPickCol(toks).getField("l").as("pred_lang"),
        TextOps.nTokensCol(toks).as("n_tokens"),
        TextOps.uniqRatioX6Col(toks).as("uniq_ratio_x6"))
      .filter(col("pred_lang") === "en" &&
        col("n_tokens") >= CleanMinTokens &&
        col("uniq_ratio_x6") >= CleanMinUniqX6)
      .join(winners, "doc_id")
      .select("doc_id", "pred_lang", "n_tokens", "uniq_ratio_x6")
      .orderBy("doc_id")
  }

  // lazy: embeds langIdSql/qualitySql, which initialize later in the object
  lazy val pipelineCleanSql: String =
    s"""WITH lang AS (SELECT * FROM ($langIdSql)),
       |qual AS (SELECT * FROM ($qualitySql)),
       |winners AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
       |SELECT d.doc_id, lang.pred_lang, qual.n_tokens, qual.uniq_ratio_x6
       |FROM documents d
       |JOIN winners USING (doc_id)
       |JOIN lang USING (doc_id)
       |JOIN qual USING (doc_id)
       |WHERE pred_lang = 'en' AND n_tokens >= $CleanMinTokens
       |  AND uniq_ratio_x6 >= $CleanMinUniqX6
       |ORDER BY doc_id""".stripMargin

  /** IVF-Flat ANN through the PERSISTED index (the faiss lifecycle the
    * engine serves at scale: Lloyd training + corpus assignment run once
    * at ingest via [[Ann.ensureIvf]], the query probes nprobe
    * cell PARTITIONS — parquet partition pruning, no training cost per
    * query). Same results as the inline [[Ann.ivfTopK]] (spec-pinned);
    * the oracle replays the whole lifecycle in SQL. */
  /** Build the persisted IVF index for `dir`'s embeddings if absent —
    * ingest-side work, pre-warmed UNTIMED by the bench like the text and
    * fielded index ensures (build cost is phase-1's measurement, never a
    * query's). Returns the cache dir. */
  def ensureIvfCache(spark: SparkSession, dir: String): String = {
    val cache = s"${sys.props("user.dir")}/target/ivf-cache/" +
      new java.io.File(dir).getName
    Ann.ensureIvf(spark, emb(spark, dir), cache)
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame =
    Ann.ivfProbe(spark, ensureIvfCache(spark, dir), AnnQueryVec, AnnK)

  /** Unrolled Lloyd replay (Ann.IvfLloydRounds): each round re-derives the
    * engine's exact fixed-point steps — micro-rounded cosine assignment
    * with cid tiebreak, per-dim mean micro-rounded THEN float32-quantized
    * (CAST REAL) so centroid bits match the engine's array<float>
    * centroids exactly; empty cells COALESCE to the previous round. */
  private def ivfLloydCtes: String =
    (1 to Ann.IvfLloydRounds).map { r =>
      val p = r - 1
      s"""n$p AS (SELECT cid, sqrt(sum(v*v)) AS c_nrm FROM c$p GROUP BY cid),
         |ad$r AS (SELECT tx.vec_id, c$p.cid, sum(tx.v * c$p.v) AS dot
         |       FROM tx JOIN c$p ON c$p.i = tx.i GROUP BY 1, 2),
         |ac$r AS (SELECT ad$r.vec_id, ad$r.cid,
         |         CAST(round(ad$r.dot / (tn.nrm * n$p.c_nrm) * 1000000.0) AS BIGINT) AS a_cos
         |       FROM ad$r JOIN tn ON tn.vec_id = ad$r.vec_id JOIN n$p USING (cid)),
         |asg$r AS (SELECT vec_id, cid FROM (
         |         SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
         |           ORDER BY a_cos DESC, cid ASC) AS rn FROM ac$r) WHERE rn = 1),
         |m$r AS (SELECT asg$r.cid, tx.i,
         |         CAST(CAST(round(avg(tx.v) * 1000000.0) / 1000000.0 AS REAL) AS DOUBLE) AS m
         |       FROM asg$r JOIN tx USING (vec_id) GROUP BY 1, 2),
         |c$r AS (SELECT c$p.cid, c$p.i, COALESCE(m$r.m, c$p.v) AS v
         |       FROM c$p LEFT JOIN m$r ON m$r.cid = c$p.cid AND m$r.i = c$p.i)""".stripMargin
    }.mkString(",\n")

  val annIvfSql: String = {
    val cf = s"c${Ann.IvfLloydRounds}"
    s"""WITH x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |             CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
       |nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM x GROUP BY vec_id),
       |tx AS (SELECT x.* FROM x WHERE vec_id % ${Ann.IvfTrainStride} = 0),
       |tn AS (SELECT vec_id, nrm FROM nrm WHERE vec_id % ${Ann.IvfTrainStride} = 0),
       |c0 AS (SELECT vec_id AS cid, i, v FROM x WHERE vec_id < ${Ann.IvfCells}),
       |$ivfLloydCtes,
       |cn AS (SELECT cid, sqrt(sum(v*v)) AS c_nrm FROM $cf GROUP BY cid),
       |ad AS (SELECT x.vec_id, $cf.cid, sum(x.v * $cf.v) AS dot
       |       FROM x JOIN $cf ON $cf.i = x.i GROUP BY 1, 2),
       |ac AS (SELECT ad.vec_id, ad.cid,
       |         CAST(round(ad.dot / (n1.nrm * cn.c_nrm) * 1000000.0) AS BIGINT) AS a_cos
       |       FROM ad JOIN nrm n1 ON n1.vec_id = ad.vec_id JOIN cn USING (cid)),
       |assigned AS (SELECT vec_id, cid FROM (
       |         SELECT vec_id, cid,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY a_cos DESC, cid ASC) AS rn
       |         FROM ac) WHERE rn = 1),
       |qcells AS (SELECT cid FROM ac WHERE vec_id = $AnnQueryVec
       |           ORDER BY a_cos DESC, cid ASC LIMIT ${Ann.IvfProbe}),
       |cand AS (SELECT vec_id FROM assigned JOIN qcells USING (cid)
       |         WHERE vec_id <> $AnnQueryVec),
       |qv AS (SELECT i, v FROM x WHERE vec_id = $AnnQueryVec),
       |d AS (SELECT x.vec_id, sum(x.v * qv.v) AS dot
       |      FROM x JOIN cand USING (vec_id) JOIN qv ON qv.i = x.i GROUP BY 1),
       |c AS (SELECT d.vec_id,
       |        CAST(round(d.dot / (n1.nrm * nq.nrm) * 1000000.0) AS BIGINT) AS cos_x6
       |      FROM d JOIN nrm n1 USING (vec_id)
       |      CROSS JOIN (SELECT nrm FROM nrm WHERE vec_id = $AnnQueryVec) nq(nrm))
       |SELECT vec_id, cos_x6 FROM c ORDER BY cos_x6 DESC, vec_id ASC LIMIT $AnnK""".stripMargin
  }

  /** Multimodal decode-kernel plumbing under the oracle gate: the REAL
    * [[graft.multimodal.Multimodal.fakeDecode]] batch kernel (binary in →
    * 16-bin L1-normalized byte histogram out) runs over each document's
    * UTF-8 bytes — the driver tables ship no media column, so text bytes
    * stand in as the opaque payload; schema, batching and the typed-map
    * execution shape are exactly the media path's. x4 micro-units through a
    * REAL cast on both sides (the kernel divides in Float). Output is one
    * scalar row per (doc, bin) — the histogram is exploded rather than
    * emitted as an array column, because the driver's oracle gate sorts
    * result frames with pandas and array cells are unsortable there. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val f = graft.multimodal.Multimodal.fakeDecode(text.getBytes("UTF-8"))
        f.iterator.zipWithIndex.map { case (v, bin) =>
          (id, bin, math.round(v.toDouble * 10000.0))
        }
      })
      .toDF("doc_id", "bin", "vx")
      .orderBy("doc_id", "bin")
  }

  val mediaFeaturesSql: String =
    """WITH n AS (SELECT doc_id, length(text)::BIGINT AS n FROM documents),
      |x AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) // 16 AS bin
      |      FROM documents, unnest(range(1, length(text)+1)) AS r(i)),
      |c AS (SELECT doc_id, bin, count(*)::BIGINT AS c FROM x GROUP BY 1, 2),
      |grid AS (SELECT doc_id, CAST(b.i AS INTEGER) AS bin
      |         FROM n, unnest(range(0, 16)) AS b(i))
      |SELECT g.doc_id, g.bin,
      |       CAST(round(CAST(CAST(coalesce(c.c, 0) / greatest(n.n, 1) AS REAL) AS DOUBLE) * 10000) AS BIGINT) AS vx
      |FROM grid g JOIN n USING (doc_id)
      |LEFT JOIN c ON c.doc_id = g.doc_id AND c.bin = g.bin
      |ORDER BY g.doc_id, g.bin""".stripMargin

  // ---- DuckDB oracle SQL --------------------------------------------------

  private val stopIn = Analyzer.EnglishStopSorted.map(s => s"'$s'").mkString(", ")

  /** Polynomial codepoint hash h←(131·h+cp) mod p as a DuckDB char fold —
    * identical to [[graft.text.HashKernels.polyHash]] for any valid UTF-8
    * input (both fold codepoints; KernelSpec pins the non-ASCII cases). */
  private def ph(c: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($c)+1), " +
      s"i -> CAST(ascii(substr($c, CAST(i AS INT), 1)) AS BIGINT))), (h, c2) -> (h*131 + c2) % ${Dedup.P})"


  val langIdSql: String = {
    val hitCols = TextOps.LangProfiles.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($inList)))::BIGINT AS hits_$lang"
    }.mkString(",\n  ")
    val langs = TextOps.LangProfiles.map(_._1)
    val caseChain = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"hits_$l >= hits_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString("\n    ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  $hitCols
       |FROM t)
       |SELECT doc_id,
       |  CASE $caseChain ELSE '${langs.last}' END AS pred_lang,
       |  greatest(${langs.map(l => s"hits_$l").mkString(", ")}) AS best_hits
       |FROM h ORDER BY doc_id""".stripMargin
  }

  val qualitySql: String =
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  len(toks)::BIGINT AS n_tokens,
       |  length(text)::BIGINT AS n_chars,
       |  CAST(round(CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE) / len(toks) * 1000000.0) AS BIGINT) AS avg_word_len_x6,
       |  CAST(round(CAST(len(list_filter(toks, x -> x IN ($stopIn))) AS DOUBLE) / len(toks) * 1000000.0) AS BIGINT) AS stop_ratio_x6,
       |  CAST(round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 1000000.0) AS BIGINT) AS uniq_ratio_x6
       |FROM t ORDER BY doc_id""".stripMargin

  val tokenCountSql: String =
    s"""SELECT doc_id, len(regexp_extract_all(text, '${TextOps.BpeTokenRegex}'))::BIGINT AS n_bpe_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** PII redaction over deterministically PII-augmented text: the corpus
    * is synthetic word-soup with no emails/IPs/phones, so BOTH sides
    * append the same derived contact block (email, phone, IPv4 keyed off
    * doc_id) before redacting — the oracle then proves the actual
    * replacement logic byte-identically, not a no-op pass. */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), pmod(col("doc_id"), lit(7L)).cast("string"),
      lit(".example.com or +1 555-0100"), col("doc_id").cast("string"),
      lit(" from 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
      lit("."), pmod(col("doc_id"), lit(251L)).cast("string"),
      lit("."), pmod(col("doc_id"), lit(241L)).cast("string"))
    TextOps.redactPii(docs(spark, dir), aug)
  }

  val redactPiiSql: String = {
    val augSql = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@mail' || CAST(doc_id % 7 AS VARCHAR) || " +
      "'.example.com or +1 555-0100' || CAST(doc_id AS VARCHAR) || " +
      "' from 10.' || CAST(doc_id % 256 AS VARCHAR) || " +
      "'.' || CAST(doc_id % 251 AS VARCHAR) || " +
      "'.' || CAST(doc_id % 241 AS VARCHAR)"
    s"""SELECT doc_id,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace($augSql, '${TextOps.EmailRx}', '<EMAIL>', 'g'),
       |      '${TextOps.Ipv4Rx}', '<IP>', 'g'),
       |    '${TextOps.PhoneRx}', '<PHONE>', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val fingerprintSql: String =
    s"""WITH tok AS (SELECT doc_id, generate_subscripts(string_split(text,' '), 1) AS pos,
       |              unnest(string_split(text,' ')) AS term FROM documents),
       |ids AS (SELECT doc_id, pos, ${ph("term")} AS tid FROM tok),
       |lists AS (SELECT doc_id, list(tid ORDER BY pos) AS ids FROM ids GROUP BY doc_id)
       |SELECT doc_id, list_reduce(list_prepend(0, ids), (a, b) -> (a*31 + b) % ${TextOps.HashP}) AS fp
       |FROM lists ORDER BY doc_id""".stripMargin

  private val shingleCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |       FROM t, unnest(range(1, len(toks)-1)) AS r(i) WHERE len(toks) >= 3),
      |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id)""".stripMargin

  /** Capped-universe Jaccard (Dedup.MaxShingleDf shared verbatim): shingles
    * with df > cap are in neither intersection nor union on EITHER side. */
  val dedupNgramSql: String =
    s"""WITH $shingleCtes,
       |keep AS (SELECT shingle FROM sh GROUP BY shingle
       |         HAVING count(*) <= ${Dedup.MaxShingleDf}),
       |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
       |szc AS (SELECT doc_id, count(*)::BIGINT AS n FROM shc GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS c
       |          FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |jac AS (SELECT a_id, b_id, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
       |        FROM inter JOIN szc sa ON sa.doc_id = a_id JOIN szc sb ON sb.doc_id = b_id)
       |SELECT a_id, b_id, CAST(round(jac * 1000000.0) AS BIGINT) AS jac_x6
       |FROM jac WHERE jac >= $JaccardThr ORDER BY a_id, b_id""".stripMargin

  val dedupMinhashSql: String = {
    val fnVals = Dedup.MinHashFns.map { case (h, a, b) => s"($h, $a, $b)" }.mkString(", ")
    s"""WITH $shingleCtes,
       |ids AS (SELECT doc_id, ${ph("shingle")} AS sid FROM sh),
       |fns(hid, a, b) AS (VALUES $fnVals),
       |sigs AS (SELECT doc_id, hid, min((a*sid + b) % ${Dedup.P}) AS mh
       |         FROM ids CROSS JOIN fns GROUP BY doc_id, hid),
       |bands AS (SELECT doc_id, hid // ${Dedup.BandRows} AS band,
       |                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY hid) AS sig
       |          FROM sigs GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
       |              AND x.doc_id < y.doc_id),
       |inter AS (SELECT a_id, b_id, count(*)::BIGINT AS c
       |          FROM cand JOIN sh a ON a.doc_id = a_id
       |               JOIN sh b ON b.doc_id = b_id AND a.shingle = b.shingle
       |          GROUP BY 1, 2),
       |jac AS (SELECT a_id, b_id, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jac
       |        FROM inter JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id)
       |SELECT a_id, b_id, CAST(round(jac * 1000000.0) AS BIGINT) AS jac_x6
       |FROM jac WHERE jac >= $JaccardThr ORDER BY a_id, b_id""".stripMargin
  }

  val dedupSimhashSql: String = {
    val fnVals = Dedup.SimHashFns.map { case (j, a, b) => s"($j, $a, $b)" }.mkString(", ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
       |ids AS (SELECT doc_id, tf, ${ph("term")} AS tid FROM tf),
       |fns(j, a, b) AS (VALUES $fnVals),
       |s AS (SELECT doc_id, j, sum(tf * (((a*tid + b) % ${Dedup.P} % 2) * 2 - 1)) AS s
       |      FROM ids CROSS JOIN fns GROUP BY doc_id, j)
       |SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  private val embCtes =
    """x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |             CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
      |nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM x GROUP BY vec_id)""".stripMargin

  val annTopKSql: String =
    s"""WITH $embCtes,
       |q AS (SELECT i, v FROM x WHERE vec_id = $AnnQueryVec),
       |d AS (SELECT x.vec_id, sum(x.v * q.v) AS dot
       |      FROM x JOIN q ON x.i = q.i WHERE x.vec_id <> $AnnQueryVec GROUP BY 1),
       |c AS (SELECT d.vec_id, CAST(round(d.dot / (n1.nrm * nq.nrm) * 1000000.0) AS BIGINT) AS cos_x6
       |      FROM d JOIN nrm n1 ON n1.vec_id = d.vec_id
       |      CROSS JOIN (SELECT nrm FROM nrm WHERE vec_id = $AnnQueryVec) nq)
       |SELECT vec_id, cos_x6 FROM c ORDER BY cos_x6 DESC, vec_id ASC LIMIT $AnnK""".stripMargin

  /** The LSH top-k replayed exactly: the 144 planes' 24-bit integer seeds
    * ([[Ann.planeBits]], plane-major) are embedded as one literal list, and
    * component (k − 2^23)/2^24 reconstructs the identical double. Bucket t
    * of a vector sets bit j iff plane (t·6+j)·v > 0 — the same sign test as
    * the Spark kernel ([[graft.sim.VecKernels.lshBuckets]]); candidates
    * share ≥1 (table, bucket) with the query; exact cosine on candidates;
    * deterministic top-k. */
  val annLshSql: String = {
    val nPlanes = Ann.LshTables * Ann.LshBits
    val flat = (for (p <- 0 until nPlanes; i <- 0 until 64)
      yield Ann.planeBits(p, i)).mkString(", ")
    s"""WITH praw(vals) AS (VALUES ([$flat])),
       |pl AS (SELECT CAST((r.i - 1) // 64 AS INTEGER) AS p,
       |              CAST((r.i - 1) % 64 AS INTEGER) AS ci,
       |              (vals[CAST(r.i AS INTEGER)] - 8388608) / 16777216.0 AS pv
       |       FROM praw, unnest(range(1, ${nPlanes * 64 + 1})) AS r(i)),
       |$embCtes,
       |dots AS (SELECT x.vec_id, pl.p, sum(x.v * pl.pv) AS dp
       |         FROM x JOIN pl ON pl.ci = x.i - 1 GROUP BY 1, 2),
       |b AS (SELECT vec_id, p // ${Ann.LshBits} AS t,
       |             sum(CASE WHEN dp > 0 THEN 1 << (p % ${Ann.LshBits}) ELSE 0 END)::BIGINT AS bucket
       |      FROM dots GROUP BY 1, 2),
       |q AS (SELECT t, bucket FROM b WHERE vec_id = $AnnQueryVec),
       |cand AS (SELECT DISTINCT b.vec_id FROM b JOIN q USING (t, bucket)
       |         WHERE b.vec_id <> $AnnQueryVec),
       |qv AS (SELECT i, v FROM x WHERE vec_id = $AnnQueryVec),
       |d AS (SELECT x.vec_id, sum(x.v * qv.v) AS dot
       |      FROM x JOIN cand USING (vec_id) JOIN qv ON qv.i = x.i GROUP BY 1),
       |c AS (SELECT d.vec_id,
       |             CAST(round(d.dot / (n1.nrm * nq.nrm) * 1000000.0) AS BIGINT) AS cos_x6
       |      FROM d JOIN nrm n1 USING (vec_id)
       |      CROSS JOIN (SELECT nrm FROM nrm WHERE vec_id = $AnnQueryVec) nq(nrm))
       |SELECT vec_id, cos_x6 FROM c ORDER BY cos_x6 DESC, vec_id ASC LIMIT $AnnK""".stripMargin
  }

  val annPairsSql: String =
    s"""WITH $embCtes,
       |d AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.v * b.v) AS dot
       |      FROM x a JOIN x b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
       |c AS (SELECT a_id, b_id, CAST(round(d.dot / (na.nrm * nb.nrm) * 1000000.0) AS BIGINT) AS cos_x6
       |      FROM d JOIN nrm na ON na.vec_id = a_id JOIN nrm nb ON nb.vec_id = b_id)
       |SELECT a_id, b_id, cos_x6 FROM c WHERE cos_x6 >= ${math.round(CosineThr * 1e6)}
       |ORDER BY a_id, b_id""".stripMargin
}
