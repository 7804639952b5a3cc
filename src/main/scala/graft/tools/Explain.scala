package graft.tools

import org.apache.spark.sql.SparkSession

import graft.harness.{QuerySet, TextQueries}
import graft.query.Searcher

/** Plan-audit main: prints formatted physical plans for the engine's key
  * paths so pushdown/broadcast/codegen can be inspected and regressions
  * spotted (`sbt "runMain graft.tools.Explain <sfDir>"`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def show(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      df.explain("formatted")
    }

    val idx = TextQueries.ensureIndex(spark, sfDir)
    show("wand_search (postings scan + kernel + merge)") {
      Searcher.search(spark, idx, QuerySet.queries, QuerySet.K)
    }
    show("naive_bm25 (tf/df/dl + broadcast joins + topk)") {
      TextQueries.bm25QuerySet(spark, sfDir)
    }
    show("tf_agg") { TextQueries.tf(spark, sfDir) }
    spark.stop()
  }
}
