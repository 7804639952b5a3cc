package graft.tools
import org.apache.spark.sql.SparkSession
object ColdMinhash {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val c = graft.harness.PipelineQueries.dedupMinhash(spark, "/root/testdata/sf0.1").count()
    System.err.println(f"[cold] q_dedup_minhash ${(System.nanoTime()-t0)/1e9}%.2fs ($c rows)")
    spark.stop()
  }
}
