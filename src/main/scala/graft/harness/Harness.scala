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

  /** Latency query set for the WebtextGen benchmark corpus (vocab w1..w9999,
    * Zipf-distributed). Mixes head terms (w1 appears in ~every doc — posting
    * lists are corpus-sized, the WAND-skip stress case), mid-ranks, and tail
    * terms, at 2-5 terms per query. The sf-vocabulary [[queries]] set matches
    * nothing in this corpus and would only measure empty-result overhead. */
  val webQueries: Seq[(Int, String)] = Seq(
    1 -> "w1 w2",
    2 -> "w1 w100 w2000",
    3 -> "w5 w50 w500 w5000",
    4 -> "w3 w7 w9",
    5 -> "w42 w777",
    6 -> "w1 w3 w2",
    7 -> "w123 w456 w789",
    8 -> "w10 w20 w30 w40",
    9 -> "w999 w1999 w2999",
    10 -> "w8 w88 w888 w8888",
    11 -> "w2 w4 w6 w8 w10",
    12 -> "w15 w1500",
    13 -> "w1 w9999",
    14 -> "w33 w66 w99",
    15 -> "w250 w251 w252",
    16 -> "w7 w77",
    17 -> "w1 w2 w3 w4 w5",
    18 -> "w600 w60 w6",
    19 -> "w4096 w2048 w1024",
    20 -> "w11 w111 w1111")
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

  val idfExpr: String =
    "ln(1.0 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))"
  val tfNormExpr: String =
    "(tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)))"
  val bm25Expr: String = s"$idfExpr * $tfNormExpr"

  /** bm25Expr with an ES per-leg boost: (idf · boost) · tfNorm — the
    * boost folds into idf FIRST, mirroring the engine's pre-multiplied
    * cursor idf parenthesization, so `w * <this>` associates exactly like
    * the kernel's (w · idf_b) · tfNorm. boost = 1.0 reuses the plain
    * expression (the engine's ×1.0 is the IEEE identity). */
  def bm25BoostExpr(boost: Double): String =
    if (boost == 1.0) bm25Expr else s"($idfExpr * $boost) * $tfNormExpr"

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

  // ---- Crossref extract layer: the oracle re-specifies F1-F5 in DuckDB SQL
  // over the same deterministic fixture file the Spark side reads through
  // its real reader path (sniff → schema'd JSON parse → simplify) ----------

  def fixturesDir: String = s"${sys.props("user.dir")}/target/fixtures"

  private[harness] def yearCase(prefix: String): String =
    s"""CASE WHEN ${prefix}issued."date-parts" IS NOT NULL THEN coalesce(${prefix}issued."date-parts"[1][1], 0)
       |  WHEN $prefix"published-online" IS NOT NULL THEN coalesce($prefix"published-online"."date-parts"[1][1], 0)
       |  WHEN $prefix"published-print" IS NOT NULL THEN coalesce($prefix"published-print"."date-parts"[1][1], 0)
       |  WHEN ${prefix}created."date-parts" IS NOT NULL THEN coalesce(${prefix}created."date-parts"[1][1], 0)
       |  ELSE 0 END""".stripMargin

  private val titleCleanExpr =
    """CASE WHEN title IS NULL OR len(title)=0 THEN ['']
      |  ELSE list_transform(title, t -> trim(replace(replace(t, chr(10), ' '), '( )+', ' '))) END""".stripMargin

  private val firstPageExpr =
    """regexp_split_to_array(coalesce(page,''), ',|-|\s')[1]"""

  /** The F5 bibliographic byte-string as a DuckDB expression over the raw
    * crossref columns — shared by the simplify oracle and the fielded
    * multi-match oracle. */
  private[harness] def bibliographicExpr: String =
    s"""concat_ws(' ',
       |    coalesce(trim(array_to_string(list_filter(list_transform(author, a -> a.family), f -> f IS NOT NULL AND f <> ''), ' ')), ''),
       |    ($titleCleanExpr)[1],
       |    coalesce(array_to_string(coalesce("container-title", []), ' '), ''),
       |    coalesce(array_to_string(coalesce("short-container-title", []), ' '), ''),
       |    coalesce(volume, ''), coalesce(issue, ''),
       |    $firstPageExpr,
       |    CAST((${yearCase("")}) AS VARCHAR))""".stripMargin

  def crossrefSimplifySql: String =
    s"""WITH src AS (
       |  SELECT * FROM read_json('$fixturesDir/ndjson_plain.ndjson', format='newline_delimited', columns={
       |    'DOI':'VARCHAR','title':'VARCHAR[]',
       |    'author':'STRUCT(given VARCHAR, family VARCHAR, sequence VARCHAR)[]',
       |    'container-title':'VARCHAR[]','short-container-title':'VARCHAR[]',
       |    'volume':'VARCHAR','issue':'VARCHAR',
       |    'issued':'STRUCT("date-parts" BIGINT[][])',
       |    'published-online':'STRUCT("date-parts" BIGINT[][])',
       |    'published-print':'STRUCT("date-parts" BIGINT[][])',
       |    'created':'STRUCT("date-parts" BIGINT[][], "date-time" TIMESTAMP, timestamp BIGINT)',
       |    'page':'VARCHAR'}))
       |SELECT DOI AS doi,
       |  coalesce(array_to_string($titleCleanExpr, '|'), '') AS title_j,
       |  $firstPageExpr AS first_page,
       |  coalesce(array_to_string(coalesce("container-title", []), '|'), '') AS journal_j,
       |  coalesce(array_to_string(coalesce("short-container-title", []), '|'), '') AS abbrev_j,
       |  coalesce(volume,'') AS volume, coalesce(issue,'') AS issue,
       |  CAST(${yearCase("")} AS BIGINT) AS year,
       |  $bibliographicExpr AS bibliographic
       |FROM src ORDER BY doi""".stripMargin

  def crossrefDumpSql: String =
    s"""WITH src AS (SELECT unnest(items) AS r
       |  FROM read_json('$fixturesDir/dump_plain.json', maximum_object_size=268435456))
       |SELECT CAST(coalesce(r.issued."date-parts"[1][1], 0) AS BIGINT) AS year,
       |       count(*)::BIGINT AS n
       |FROM src GROUP BY 1 ORDER BY 1""".stripMargin

  def crossrefGzSql: String =
    s"""SELECT count(*)::BIGINT AS n, count(DISTINCT DOI)::BIGINT AS n_doi
       |FROM read_json('$fixturesDir/ndjson_gz.json.gz', format='newline_delimited',
       |               columns={'DOI':'VARCHAR'})""".stripMargin

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
  private val IdxVersion = "v2"

  /** Build (once, snapshot-idempotent) the on-disk index for an sf dir.
    * The codec-format guard wipes+rebuilds a cached index written by an
    * older block format instead of serving unreadable blocks. */
  def ensureIndex(spark: SparkSession, dir: String): String = {
    val name = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val idxDir = s"${sys.props("user.dir")}/target/graft-idx/${IdxVersion}_$name"
    PostingsBuilder.ensureFormat(new graft.io.TableIO(idxDir))
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

  // ---- Crossref extract layer queries ------------------------------------
  import graft.extract.{Crossref, CrossrefFixtures, CrossrefReader}

  private def fixtures(): String = CrossrefFixtures.ensure(Oracle.fixturesDir)

  /** Full extract pipeline over the NDJSON fixture via the real reader path:
    * sniff → pinned-schema JSON parse → F1-F5 simplify. */
  def crossrefSimplify(spark: SparkSession, dir: String): DataFrame = {
    val fix = fixtures()
    Crossref.simplify(CrossrefReader.load(spark, s"$fix/ndjson_plain.ndjson"))
      .select(col("DOI").as("doi"),
        array_join(col("title"), "|").as("title_j"),
        col("first_page"),
        array_join(col("journal"), "|").as("journal_j"),
        array_join(col("abbreviated_journal"), "|").as("abbrev_j"),
        col("volume"), col("issue"),
        col("year").cast("long").as("year"),
        col("bibliographic"))
      .orderBy("doi")
  }

  /** Dump-format reader (multiLine + explode items) aggregated by year. */
  def crossrefDump(spark: SparkSession, dir: String): DataFrame = {
    val fix = fixtures()
    Crossref.simplify(CrossrefReader.load(spark, s"$fix/dump_plain.json"))
      .groupBy(col("year").cast("long").as("year"))
      .agg(count(lit(1)).as("n"))
      .orderBy("year")
  }

  /** Gzip NDJSON source (extension-selected codec, like data.go:186-196). */
  def crossrefGz(spark: SparkSession, dir: String): DataFrame = {
    val fix = fixtures()
    CrossrefReader.load(spark, s"$fix/ndjson_gz.json.gz")
      .agg(count(lit(1)).as("n"), countDistinct(col("DOI")).as("n_doi"))
  }

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
