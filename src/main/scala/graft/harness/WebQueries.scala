package graft.harness

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.web.{HtmlExtract, WebtextGen}

/** Webtext-path queries over a staged fixture corpus at the input_hint
  * schema. The Spark side computes from extract(html); the DuckDB oracle
  * computes from the generator's `text` ground-truth column — so the gate
  * itself proves the per-url byte-identity extraction invariant end-to-end
  * (any extraction difference changes the token relation and fails the df
  * compare).
  *
  * Oracle tokenizer note: on this corpus the UAX#29 chain coincides with
  * `regexp_extract_all(text, '[a-z0-9]+')` (entity-bearing tokens like
  * "r&d" split identically) — asserted in WebSpec. */
object WebQueries {

  val FixtureDocs = 2000L

  def fixturePath: String =
    s"${sys.props("user.dir")}/target/fixtures-web/webdocs.parquet"

  def ensureFixture(spark: SparkSession): String = {
    if (!Files.exists(Paths.get(fixturePath))) {
      WebtextGen.generateDf(spark, FixtureDocs, 8)
        .write.mode("overwrite").parquet(fixturePath)
    }
    fixturePath
  }

  private def webdocs(spark: SparkSession): DataFrame =
    spark.read.parquet(ensureFixture(spark))

  /** Last-write-wins crawl stats per url. */
  def webLww(spark: SparkSession, dir: String): DataFrame =
    webdocs(spark).groupBy("url")
      .agg(max("warc_ts").as("kept_ts"), count(lit(1)).as("n_crawls"))
      .orderBy("url")

  /** Document frequency over the EXTRACTED corpus: extract(html) → LWW dedup
    * → analysis chain → distinct (url, term) → df. The oracle recomputes
    * from the `text` column — equality proves extraction byte-identity. */
  def webDf(spark: SparkSession, dir: String): DataFrame = {
    // round-6 shape (guide §2.3/§4): project to (url, warc_ts, html) BEFORE
    // the url exchange (text/lang never cross the wire), extract + analyze
    // AFTER the LWW winner filter (losers never pay the extractor), analyze
    // through the codegen expression (identical semantics to the UDF —
    // AnalyzerSpec), and dedup terms ROW-LOCALLY with array_distinct: after
    // LWW there is exactly one row per url, so distinct (url, term) is a
    // per-row set — the former corpus-wide distinct exchange was a no-op
    // re-shuffle.
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc)
    webdocs(spark)
      .select(col("url"), col("warc_ts"), col("html"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("url"), explode(array_distinct(
        graft.index.TextIndex.analyzeStopCol(
          HtmlExtract.extractCol(col("html"))))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy("term")
  }

  /** Host regex shared verbatim by both engines (no parse_url in DuckDB —
    * a common literal regex keeps the derivation identical). */
  val HostRegex = "^https?://([^/]+)"

  /** Host-level curation stats — the domain-granularity aggregation a web
    * pipeline uses for blocklists / per-domain sampling decisions (C4-style
    * curation operates per host): LWW-dedup per url, extract(html), count
    * tokens, aggregate per host. The Spark side derives tokens from the
    * EXTRACTED html; the oracle from the generator's ground-truth `text` —
    * so the gate proves extraction byte-identity at host granularity too.
    *
    * 100-TB shape: the url window and the per-url crawl count share ONE
    * hash exchange on url; the host rollup is a sum/count hash aggregation
    * with map-side partials, so Zipf-skewed hosts (the web's shape) cost
    * one combiner each per task, never a hot reducer of raw rows. */
  def webHost(spark: SparkSession, dir: String): DataFrame = {
    // round-6: project before the url exchange (html/url/warc_ts only) and
    // count tokens through the codegen analyzer expression (the ScalaUDF
    // forced a non-codegen projection stage — guide §4); window structure
    // unchanged (both url windows share one exchange, PlanSpec-pinned).
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc)
    val wUrl = Window.partitionBy(col("url"))
    webdocs(spark)
      .select(col("url"), col("warc_ts"), col("html"))
      .withColumn("_rn", row_number().over(w))
      .withColumn("url_crawls", count(lit(1)).over(wUrl))
      .filter(col("_rn") === 1)
      .withColumn("n_tokens",
        size(graft.index.TextIndex.analyzeStopCol(
          HtmlExtract.extractCol(col("html")))).cast("long"))
      .select(regexp_extract(col("url"), HostRegex, 1).as("host"),
        col("url_crawls"), col("n_tokens"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        sum(col("url_crawls")).as("n_crawls"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(sum(col("n_tokens")).cast("double") * 1e6 / count(lit(1)))
          .cast("long").as("avg_tokens_x6"))
      .orderBy("host")
  }

  private val stopIn = Analyzer.EnglishStopSorted.map(s => s"'$s'").mkString(", ")

  def webLwwSql: String =
    s"""SELECT url, max(warc_ts) AS kept_ts, count(*)::BIGINT AS n_crawls
       |FROM read_parquet('$fixturePath/*.parquet') GROUP BY url ORDER BY url""".stripMargin

  def webHostSql: String =
    s"""WITH r AS (SELECT url, text,
       |    row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn,
       |    count(*) OVER (PARTITION BY url) AS url_crawls
       |  FROM read_parquet('$fixturePath/*.parquet')),
       |d AS (SELECT regexp_extract(url, '$HostRegex', 1) AS host, url_crawls,
       |    len(list_filter(regexp_extract_all(text, '[a-z0-9]+'),
       |        t -> t NOT IN ($stopIn)))::BIGINT AS n_tokens
       |  FROM r WHERE rn = 1)
       |SELECT host, count(*)::BIGINT AS n_urls, sum(url_crawls)::BIGINT AS n_crawls,
       |  sum(n_tokens)::BIGINT AS sum_tokens,
       |  CAST(round(sum(n_tokens) * 1000000.0 / count(*)) AS BIGINT) AS avg_tokens_x6
       |FROM d GROUP BY host ORDER BY host""".stripMargin

  def webDfSql: String =
    s"""WITH d AS (
       |  SELECT url, text FROM (
       |    SELECT url, text, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
       |    FROM read_parquet('$fixturePath/*.parquet')) WHERE rn = 1),
       |tok AS (SELECT DISTINCT url, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM d),
       |tok2 AS (SELECT url, term FROM tok WHERE term NOT IN ($stopIn))
       |SELECT term, count(*)::BIGINT AS df FROM tok2 GROUP BY term ORDER BY term""".stripMargin
}
