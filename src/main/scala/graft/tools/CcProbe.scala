package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Distributed connected-components probe: forces the relax+pointer-jump
  * path (the 100-TB shape) on a synthetic graph that is deliberately
  * adversarial for label propagation — many small components PLUS one long
  * drift chain (the LSH near-dup chain case), which a pure relax loop
  * would need chain-length rounds for.
  *
  * `runMain graft.tools.CcProbe [nSmallComps] [chainLen] [cores]` —
  * defaults 100k comps of size 10 + one 10k chain (≈0.9M edges). Verifies
  * the labeling exactly, reports wall. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nComps = if (args.nonEmpty) args(0).toLong else 100000L
    val chainLen = if (args.length > 1) args(1).toLong else 10000L
    require(chainLen >= 2, "chainLen must be >= 2 (a chain needs an edge)")
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // components [10j, 10j+9] as chains, then one long chain at the top
    val small = spark.range(0L, nComps * 10)
      .where(col("id") % 10 =!= 9)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val base = nComps * 10
    val long = spark.range(base, base + chainLen - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val pairs = small.unionByName(long)

    val prev = Dedup.ccDriverMaxEdges
    try {
      Dedup.ccDriverMaxEdges = 0L // force the distributed loop
      val t0 = System.nanoTime()
      val cc = Dedup.connectedComponents(pairs).cache()
      val n = cc.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val comps = cc.select(countDistinct(col("cluster_id"))).head().getLong(0)
      val wrong = cc.filter(
        (col("doc_id") < base && col("cluster_id") =!= (col("doc_id") - col("doc_id") % 10)) ||
        (col("doc_id") >= base && col("cluster_id") =!= base)).count()
      System.err.println(
        f"[cc] nodes=$n comps=$comps (expect ${nComps + 1}) wrong=$wrong wall=$wall%.1fs")
      require(wrong == 0 && comps == nComps + 1, "labeling mismatch")
    } finally Dedup.ccDriverMaxEdges = prev
    spark.stop()
  }
}
