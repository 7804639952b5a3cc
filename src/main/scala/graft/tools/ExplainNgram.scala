package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan probe for the dedup self-joins (exchange-reuse audit). */
object ExplainNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.dedup.Dedup.ngramJaccardPairs(docs, 0.2)
      .queryExecution.executedPlan.toString
    println("== reused exchanges: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println("== exchanges: " + "Exchange".r.findAllIn(plan).length)
    println("== shingle kernels: " + "graft_shingles".r.findAllIn(plan).length)
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("graft_shingles") ||
        l.contains("Scan parquet")).mkString("\n"))
    spark.stop()
  }
}
