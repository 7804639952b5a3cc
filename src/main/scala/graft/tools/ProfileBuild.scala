package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.PostingsBuilder
import graft.io.TableIO
import graft.web.{WebIndex, WebtextGen}

/** Scaling-diagnosis harness: warm-JIT per-step build timing at a given
  * core count (mirrors Bench.buildRun; GRAFT_STEP_TIMING=1 for step logs). */
object ProfileBuild {

  /** Per-stage diagnostics: task count, wall, Σrun, Σcpu, ΣGC — separates
    * "too few tasks" from "GC-bound" from "blocked off-CPU". */
  private final class StageLog extends org.apache.spark.scheduler.SparkListener {
    override def onStageCompleted(
        e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      val wall = (for {c <- si.completionTime; s <- si.submissionTime}
        yield c - s).getOrElse(-1L)
      if (wall >= 500 && sys.env.contains("GRAFT_STAGE_LOG"))
        System.err.println(
          f"[stage] id=${si.stageId}%-4d tasks=${si.numTasks}%-4d wall=${wall / 1000.0}%6.2fs " +
          f"run=${m.executorRunTime / 1000.0}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs " +
          f"gc=${m.jvmGCTime / 1000.0}%6.2fs " +
          f"spill=${m.diskBytesSpilled / 1048576}%5dMB  ${si.name.take(60)}")
    }
  }

  def run(cores: Int, docs: Long, shufflePartitions: Int, tag: String): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("profile")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new StageLog)
    val dir = sys.env.getOrElse("GRAFT_PROFILE_DIR", "/tmp/profile-idx") + s"/$tag"
    new TableIO(dir).deleteAll()
    val df = WebtextGen.generateDf(spark, docs, 128)
    val t0 = System.nanoTime()
    WebIndex.build(spark, df, dir,
      PostingsBuilder.Config(shardSize = 8192, shardGroups = 1))
    System.err.println(
      f"[total] cores=$cores docs=$docs ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }

  /** Bench-shaped run: read a pre-staged corpus dir (what Bench.buildRun
    * times) instead of generating in-session. */
  def runStaged(cores: Int, corpusDir: String, tag: String): Unit = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("profile")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (4 << 20).toString)
      .config("spark.sql.files.openCostInBytes", (1 << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new StageLog)
    val dir = sys.env.getOrElse("GRAFT_PROFILE_DIR", "/tmp/profile-idx") + s"/$tag"
    new TableIO(dir).deleteAll()
    val t0 = System.nanoTime()
    WebIndex.build(spark, spark.read.parquet(corpusDir), dir,
      PostingsBuilder.Config(shardSize = 8192, shardGroups = 1))
    System.err.println(
      f"[total] cores=$cores staged ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "gen") {
      // ProfileBuild gen <docs> <dir> — stage a corpus for `staged` runs
      val spark = SparkSession.builder().master("local[32]")
        .appName("gen").config("spark.ui.enabled", "false").getOrCreate()
      WebtextGen.generateDf(spark, args(1).toLong, 256)
        .write.mode("overwrite").parquet(args(2))
      spark.stop()
      return
    }
    if (args.length >= 3 && args(0) == "staged") {
      // ProfileBuild staged <cores> <corpusDir> — warmup on same corpus at
      // low docs is skipped; run twice (2nd is the JIT-warm datapoint)
      val cores = args(1).toInt
      runStaged(cores, args(2), "warm")
      System.err.println(s"[timed $cores]")
      runStaged(cores, args(2), s"s$cores")
      return
    }
    if (args.length >= 2 && args(0) == "single") {
      // ProfileBuild single <cores> <docs>  — one warm-up at /10 then one run
      val cores = args(1).toInt
      val docs = if (args.length > 2) args(2).toLong else 120000L
      run(cores, docs / 10, 64, "warmup")
      System.err.println(s"[timed $cores]")
      run(cores, docs, 64, s"c$cores")
      return
    }
    val docs = if (args.length > 0) args(0).toLong else 120000L
    System.err.println("[warmup]")
    run(32, docs / 10, 64, "warmup")
    System.err.println("[timed 8]")
    run(8, docs, 64, "c8")
    System.err.println("[timed 32]")
    run(32, docs, 64, "c32")
  }
}
