package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analysis.Analyzer
import graft.index.TextIndex

/** Fixed reference query set for rank-identity checks (FIXTURES.md §4).
  * Raw query strings are analyzed with the engine's own chain — stopwords
  * ("the", "a") drop out, out-of-vocabulary terms ("item", "watermark")
  * contribute nothing, and a repeated term contributes once per occurrence
  * (Lucene semantics). */
object QuerySet {
  val queries: Seq[(Int, String)] = Seq(
    1 -> "fast join merge",
    2 -> "hash join",
    3 -> "the slow scan",
    4 -> "group agg window",
    5 -> "customer order line",
    6 -> "spark stream batch",
    7 -> "vector value",
    8 -> "big small fast slow",
    9 -> "sort merge join hash",
    10 -> "table scan filter",
    11 -> "key value",
    12 -> "query data",
    13 -> "row column",
    14 -> "dup key",
    15 -> "window filter sort",
    16 -> "a the spark",
    17 -> "merge part",
    18 -> "line item order",
    19 -> "stream window watermark",
    20 -> "scan scan scan")

  /** Analyzed (qid, term) pairs — duplicates preserved. */
  val terms: Seq[(Int, String)] =
    queries.flatMap { case (qid, q) => Analyzer.analyzeStop(q).map(qid -> _) }

  val flagship: String = "fast join merge"
  val flagshipTerms: Seq[(Int, String)] =
    Analyzer.analyzeStop(flagship).map(1 -> _)

  val K: Int = 10
}

/** DuckDB oracle SQL. Built from the same constants (stop list, query set,
  * BM25 literals) as the Spark side, with identical expression
  * parenthesization, so per-term doubles agree to the ULP and micro-unit
  * rounding absorbs FP-sum-order noise.
  *
  * The corpus `text` is single-space-separated lowercase ASCII words
  * (TESTDATA), so DuckDB's `string_split(text, ' ')` is exactly the engine's
  * UAX#29 analysis chain on this input — asserted by AnalyzerSpec. */
object Oracle {
  private val stopIn = Analyzer.EnglishStopSorted.map(s => s"'$s'").mkString(", ")

  /** Shared CTE block: analyzed tokens, tf, df, dl, corpus stats. */
  val baseCtes: String =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tok2 AS (SELECT doc_id, term FROM tok WHERE term NOT IN ($stopIn)),
       |tf AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok2 GROUP BY term, doc_id),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |dl AS (SELECT d.doc_id, count(t.term)::BIGINT AS dl FROM documents d LEFT JOIN tok2 t ON d.doc_id = t.doc_id GROUP BY d.doc_id),
       |stats AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl)""".stripMargin

  val bm25Expr: String =
    "ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5)) * " +
      "(tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)))"

  private def valuesList(ts: Seq[(Int, String)]): String =
    ts.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  def topkSql(ts: Seq[(Int, String)], k: Int): String =
    s"""WITH $baseCtes,
       |qterms(qid, term) AS (VALUES ${valuesList(ts)}),
       |scored AS (
       |  SELECT q.qid, tf.doc_id, sum($bm25Expr) AS score
       |  FROM qterms q
       |  JOIN tf ON tf.term = q.term
       |  JOIN dft ON dft.term = q.term
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY q.qid, tf.doc_id),
       |ranked AS (
       |  SELECT qid, doc_id, CAST(round(score * 1000000.0) AS BIGINT) AS score_x6,
       |         row_number() OVER (PARTITION BY qid ORDER BY CAST(round(score * 1000000.0) AS BIGINT) DESC, doc_id ASC) AS rnk
       |  FROM scored)
       |SELECT CAST(qid AS BIGINT) AS qid, rnk, doc_id, score_x6 FROM ranked WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin

  val docTokensSql: String =
    s"""WITH $baseCtes
       |SELECT doc_id, dl AS n_tokens FROM dl ORDER BY doc_id""".stripMargin

  val tfSql: String =
    s"""WITH $baseCtes
       |SELECT term, doc_id, tf FROM tf ORDER BY term, doc_id""".stripMargin

  val dfSql: String =
    s"""WITH $baseCtes
       |SELECT term, df FROM dft ORDER BY term""".stripMargin

  val corpusStatsSql: String =
    s"""WITH $baseCtes
       |SELECT n_docs, CAST(round(avgdl * 1000000.0) AS BIGINT) AS avgdl_x6 FROM stats""".stripMargin

  val dedupExactSql: String =
    """SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
      |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin

  val dedupLwwSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
      |FROM (SELECT user_id, event_id, event_type,
      |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin
}

/** Spark implementations of every oracle-checked query. Each takes the sf
  * directory (driver contract) and must produce column names identical to the
  * oracle SQL. */
object TextQueries {
  import graft.index.PostingsBuilder
  import graft.query.Searcher

  /** Index format version — bump to invalidate cached on-disk test indexes. */
  private val IdxVersion = "v1"

  /** Build (once, snapshot-idempotent) the on-disk index for an sf dir. */
  def ensureIndex(spark: SparkSession, dir: String): String = {
    val name = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val idxDir = s"${sys.props("user.dir")}/target/graft-idx/${IdxVersion}_$name"
    if (!PostingsBuilder.isComplete(idxDir)) {
      PostingsBuilder.build(spark, docs(spark, dir), idxDir,
        PostingsBuilder.Config(shardSize = 128, shardGroups = 2))
    }
    idxDir
  }

  /** Full engine path: compressed doc-sharded postings + block-max WAND.
    * Oracle-checked against the same SQL as the naive scorer — the driver's
    * gate therefore proves WAND rank-identity end-to-end. */
  def bm25Wand(spark: SparkSession, dir: String): DataFrame =
    Searcher.search(spark, ensureIndex(spark, dir), QuerySet.queries, QuerySet.K)

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  def docTokens(spark: SparkSession, dir: String): DataFrame =
    TextIndex.docLens(docs(spark, dir))
      .select(col("doc_id"), col("dl").as("n_tokens"))
      .orderBy("doc_id")

  def tf(spark: SparkSession, dir: String): DataFrame =
    TextIndex.termFreqs(TextIndex.tokens(docs(spark, dir)))
      .select("term", "doc_id", "tf")
      .orderBy("term", "doc_id")

  def df(spark: SparkSession, dir: String): DataFrame =
    TextIndex.docFreqs(TextIndex.termFreqs(TextIndex.tokens(docs(spark, dir))))
      .select("term", "df")
      .orderBy("term")

  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    TextIndex.corpusStats(TextIndex.docLens(docs(spark, dir)))
      .select(col("n_docs"), TextIndex.microRound(col("avgdl")).as("avgdl_x6"))

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    TextIndex.topK(
      TextIndex.scoreQueries(spark, docs(spark, dir), QuerySet.flagshipTerms),
      QuerySet.K)

  def bm25QuerySet(spark: SparkSession, dir: String): DataFrame =
    TextIndex.topK(
      TextIndex.scoreQueries(spark, docs(spark, dir), QuerySet.terms),
      QuerySet.K)

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
      .orderBy("keep_id")

  /** Last-write-wins dedup — the engine analogue of ES doc-id overwrite
    * semantics (reference elastic/elastic.go:165-167), as a window op. */
  def dedupLww(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"))
      .orderBy("user_id")
  }
}
