package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc per-query timing: `runMain graft.tools.TimeQueries <sfDir> [names...]`
  * (all queries when no names given). Two passes per query; reports the
  * second (warm-JIT) one. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .appName("time-queries")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names; fn <- SparkEntry.queries.get(n)) {
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      System.err.println(f"[time] $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($c rows)")
    }
    spark.stop()
  }
}
