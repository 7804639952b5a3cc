package graft.meta

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Throughput instrumentation (reference S14: docs/sec logged per 100k docs,
  * elastic/elastic.go:171-210): a SparkListener accumulating task metrics
  * across a build, surfaced into the bench JSON and the lineage/metrics
  * story. */
final class BuildMetrics extends SparkListener {
  val taskTimeMs = new LongAdder
  val recordsRead = new LongAdder
  val shuffleBytes = new LongAdder
  val peakTasks = new AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      taskTimeMs.add(m.executorRunTime)
      recordsRead.add(m.inputMetrics.recordsRead)
      shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
    }
  }
}

object BuildMetrics {
  /** Run `body` with a metrics listener attached; returns (result, metrics). */
  def measure[T](spark: SparkSession)(body: => T): (T, BuildMetrics) = {
    val m = new BuildMetrics
    spark.sparkContext.addSparkListener(m)
    try {
      val r = body
      // the listener bus is async; drain it deterministically (the fixed
      // 300ms sleep this replaces undercounted on loaded hosts)
      org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(spark.sparkContext)
      (r, m)
    } finally spark.sparkContext.removeSparkListener(m)
  }
}
