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
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc)
    val deduped = webdocs(spark)
      .withColumn("extracted", HtmlExtract.extractCol(col("html")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
    deduped
      .select(col("url"),
        explode(graft.index.TextIndex.analyzeStopUdf(col("extracted"))).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy("term")
  }

  private val stopIn = Analyzer.EnglishStopSorted.map(s => s"'$s'").mkString(", ")

  def webLwwSql: String =
    s"""SELECT url, max(warc_ts) AS kept_ts, count(*)::BIGINT AS n_crawls
       |FROM read_parquet('$fixturePath/*.parquet') GROUP BY url ORDER BY url""".stripMargin

  def webDfSql: String =
    s"""WITH d AS (
       |  SELECT url, text FROM (
       |    SELECT url, text, row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
       |    FROM read_parquet('$fixturePath/*.parquet')) WHERE rn = 1),
       |tok AS (SELECT DISTINCT url, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM d),
       |tok2 AS (SELECT url, term FROM tok WHERE term NOT IN ($stopIn))
       |SELECT term, count(*)::BIGINT AS df FROM tok2 GROUP BY term ORDER BY term""".stripMargin
}
