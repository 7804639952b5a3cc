package graft.meta

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Periodic build-throughput cadence — the engine analogue of the
  * reference's live progress signal, which logs docs/sec every 100k docs
  * below 1M and every 1M after (`elastic/elastic.go:175-176,200-207`).
  *
  * A SparkListener counts rows WRITTEN by the stage it is scoped to (the
  * builder attaches it around the doc_terms analyze+stage step, whose
  * output rows are exactly the analyzed docs) and emits one line + one
  * interval row each time the cumulative count crosses a mark. Counts
  * arrive at task granularity — on a 1000-executor cluster that is a
  * smooth stream of task completions; on a tiny local build several marks
  * may be crossed by one task, in which case each mark still gets its own
  * row (with the count observed at emission time). */
final class ProgressReporter(
    val small: Long = 100000L,
    val switchAt: Long = 1000000L,
    val big: Long = 1000000L,
    sink: String => Unit = System.err.println,
    /** Count ONLY jobs of this job group. Listeners are context-global, so
      * without scoping a reporter attached to one field's doc_terms stage
      * during a CONCURRENT fielded build also counts every sibling field's
      * writes — the per-field docs/sec lines over-count. The builder tags
      * its staged write with a unique group id and passes it here; the
      * stage→job→group mapping is captured at onJobStart. */
    groupId: Option[String] = None) extends SparkListener {

  private val t0 = System.currentTimeMillis()
  private val docs = new AtomicLong()
  private val lastMark = new AtomicLong()
  private val rows =
    new java.util.concurrent.CopyOnWriteArrayList[ProgressReporter.Interval]()
  private val groupStages =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  private def nextMark(m: Long): Long = if (m < switchAt) m + small else m + big

  override def onJobStart(j: SparkListenerJobStart): Unit =
    if (groupId.exists(g => j.properties != null &&
        g == j.properties.getProperty("spark.jobGroup.id")))
      j.stageIds.foreach(groupStages.add(_))

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    if (groupId.isDefined && !groupStages.contains(t.stageId)) return
    val m = t.taskMetrics
    if (m == null) return
    val d = m.outputMetrics.recordsWritten
    if (d <= 0) return
    val total = docs.addAndGet(d)
    var mark = lastMark.get()
    while (nextMark(mark) <= total) {
      mark = nextMark(mark)
      lastMark.set(mark)
      val elapsed = math.max(1L, System.currentTimeMillis() - t0)
      val rate = total * 1000.0 / elapsed
      rows.add(ProgressReporter.Interval(mark, total, elapsed, rate))
      sink(f"[graft-progress] $total%d docs staged, $rate%.0f docs/sec")
    }
  }

  def totalDocs: Long = docs.get()

  def intervals: Seq[ProgressReporter.Interval] = {
    import scala.jdk.CollectionConverters._
    rows.asScala.toSeq
  }
}

object ProgressReporter {
  /** One cadence row: the mark crossed, the cumulative docs observed when
    * it was crossed, wall-clock since the stage started, and the running
    * docs/sec — the reference's `1000/(ms) × NumFlushed` formula shape. */
  final case class Interval(mark: Long, docs: Long, elapsed_ms: Long,
      docs_per_sec: Double)
}
