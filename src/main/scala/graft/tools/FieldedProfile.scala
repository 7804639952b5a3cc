package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{FieldedIndex, PostingsBuilder}
import graft.io.TableIO

/** Fielded-build scale probe: `runMain graft.tools.FieldedProfile [nDocs]
  * [cores]` — builds the full 9-populated-field crossref mapping over a
  * deterministic synthetic SimplifiedPublication corpus and reports wall +
  * docs/s (plus per-step timing via GRAFT_STEP_TIMING). Shapes mirror the
  * fixture generator: titles of ~6 tokens, short journal strings, numeric
  * keyword fields, a ~10-token bibliographic — the metadata-heavy profile
  * per-field indexing exists for (the fat-text case is the webtext bench). */
object FieldedProfile {

  /** Synthetic corpus in the simplify() output shape, pure column exprs —
    * deterministic, no UDFs, generated at any scale. */
  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(0L, n, 1L, 128).select(
      concat(lit("10.1/syn."), col("id")).as("DOI"),
      array(concat(lit("Record "), col("id"), lit(" title")),
        concat(lit("second title "), col("id"))).as("title"),
      array(concat(lit("Journal "), col("id") % 1000)).as("journal"),
      array(concat(lit("J"), col("id") % 1000)).as("abbreviated_journal"),
      (col("id") % 50).cast("string").as("volume"),
      (col("id") % 12).cast("string").as("issue"),
      (lit(1990) + col("id") % 30).cast("int").as("year"),
      (lit(100) + col("id") % 900).cast("string").as("first_page"),
      concat(lit("fam"), col("id"), lit(" Record "), col("id"),
        lit(" title Journal "), col("id") % 1000, lit(" "),
        col("id") % 50, lit(" "), col("id") % 12, lit(" "),
        lit(100) + col("id") % 900, lit(" "),
        lit(1990) + col("id") % 30).as("bibliographic"))

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("fielded-profile")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the input untimed (the table exists before any build)
    val src = s"${sys.props("user.dir")}/target/fielded-profile/src$n"
    if (!new java.io.File(s"$src/_SUCCESS").exists())
      corpus(spark, n).write.mode("overwrite").parquet(src)

    val dir = s"${sys.props("user.dir")}/target/fielded-profile/idx"
    new TableIO(dir).deleteAll()
    val docs = spark.read.parquet(src)
    val t0 = System.nanoTime()
    FieldedIndex.build(spark, docs, dir, FieldedIndex.CrossrefMapping,
      keyCol = "DOI", PostingsBuilder.Config(shardSize = 8192))
    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[fielded] docs=$n fields=9 wall=$wall%.1fs docs_per_sec=${n / wall}%.0f")
    spark.stop()
  }
}
