package graft

import org.apache.spark.sql.SparkSession

import graft.harness.QuerySet
import graft.index.PostingsBuilder
import graft.io.TableIO
import graft.meta.BuildMetrics
import graft.query.Searcher
import graft.web.{WebIndex, WebtextGen}

/** Round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Three measurements (BASELINE.md targets):
  *  1. per-query wall times over the sf tables ("queries" key);
  *  2. index-build docs/sec on the deterministic webtext corpus at TWO
  *     parallelism levels — local[N] and local[4N] on the same input — the
  *     sandbox protocol for the north_rule's N→4N cluster-scaling criterion;
  *     efficiency = (docs/sec_4N / docs/sec_N) / 4, target ≥ 0.8;
  *  3. top-k query latency p95 over the 20-query set against the built
  *     index (each query timed individually, end-to-end).
  */
object Bench {

  private def session(cores: Int, shufflePartitions: Int = 0): SparkSession = {
    val parts = if (shufflePartitions > 0) shufflePartitions else cores * 2
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timeIt[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One timed index build at `cores`; returns docs/sec. Both scaling runs
    * use the SAME shuffle-partition count (2×4N) so the only variable is
    * core count — the cleanest analogue of "same job, N vs 4N executors". */
  private def buildRun(cores: Int, shufflePartitions: Int, nDocs: Long,
                       tag: String): (Double, Double) = {
    val spark = session(cores, shufflePartitions)
    try {
      val dir = s"${sys.props("user.dir")}/target/bench-idx/$tag"
      new TableIO(dir).deleteAll()
      val docs = WebtextGen.generateDf(spark, nDocs, 128)
      val ((_, metrics), wall) = timeIt {
        BuildMetrics.measure(spark) {
          WebIndex.build(spark, docs, dir,
            PostingsBuilder.Config(shardSize = 8192, shardGroups = 1))
        }
      }
      (nDocs.toDouble / wall, wall)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString).toInt
    val n4 = cpus
    val n1 = math.max(1, cpus / 4)
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "120000").toLong

    // ---- 1. scaling FIRST, on a clean JVM (heap state from the heavy
    // query phase would otherwise pollute the GC profile of the timed
    // builds): same build, same input, same shuffle partitions, N vs 4N
    // cores. JIT warmup at small size so the first timed run isn't
    // penalized.
    buildRun(n4, n4 * 2, benchDocs / 10, "warmup")
    val (dpsN, wallN) = buildRun(n1, n4 * 2, benchDocs, s"n$n1")
    val (dps4N, wall4N) = buildRun(n4, n4 * 2, benchDocs, s"n$n4")
    val efficiency = (dps4N / dpsN) / (n4.toDouble / n1.toDouble)

    // ---- 2. per-query timings over the sf tables --------------------------
    val sparkQ = session(cpus)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (_, sec) = timeIt {
        try fn(sparkQ, sfDir).count()
        catch { case _: Throwable => -1L }
      }
      name -> sec
    }
    sparkQ.stop()

    // ---- 3. query latency p95 against the 4N index ------------------------
    val sparkL = session(n4)
    val idxDir = s"${sys.props("user.dir")}/target/bench-idx/n$n4"
    // warm the reader path once, then time each query individually
    Searcher.search(sparkL, idxDir, Seq(QuerySet.queries.head), QuerySet.K).count()
    val lats = QuerySet.queries.map { q =>
      val (_, sec) = timeIt {
        Searcher.search(sparkL, idxDir, Seq(q), QuerySet.K).count()
      }
      sec * 1000.0
    }.sorted
    sparkL.stop()
    val p95 = lats(math.min(lats.length - 1, (lats.length * 0.95).toInt))
    val p50 = lats(lats.length / 2)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(
      s"""{"metric":"index_build_docs_per_sec_4N","value":${f"$dps4N%.1f"},"unit":"docs/sec",""" +
        s""""queries":$qs,"sf":"$sfDir","queries_total_sec":${f"$total%.1f"},""" +
        s""""bench_docs":$benchDocs,""" +
        s""""scaling":{"cores_n":$n1,"cores_4n":$n4,"docs_per_sec_n":${f"$dpsN%.1f"},""" +
        s""""docs_per_sec_4n":${f"$dps4N%.1f"},"build_wall_n_sec":${f"$wallN%.1f"},""" +
        s""""build_wall_4n_sec":${f"$wall4N%.1f"},"efficiency":${f"$efficiency%.3f"}},""" +
        s""""query_latency_ms":{"p50":${f"$p50%.1f"},"p95":${f"$p95%.1f"}}}""")
  }
}
