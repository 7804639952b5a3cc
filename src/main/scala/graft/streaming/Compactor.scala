package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.{IndexTables, PostingsBuilder}
import graft.io.TableIO
import graft.web.WebIndex

/** Cross-batch last-write-wins compaction of a streamed index — the engine
  * analogue of the reference's Elasticsearch `"index"` action overwriting a
  * re-crawled doc id across ALL prior writes (elastic/elastic.go:165-167),
  * which per-batch ingest deliberately defers: a url re-crawled in a later
  * micro-batch exists twice until compaction folds the segments.
  *
  * Model (the Lucene merge / LSM-compaction shape): read the immutable
  * staged corpora — base `docs` (epoch −1) plus every active segment's
  * `stream_docs` (epoch = batchId) — collapse per url keeping the HIGHEST
  * epoch (arrival order, exactly the ES overwrite order; urls are unique
  * within each epoch after ingest-time dedup), rebuild a complete fresh
  * index in a side directory, then atomically swap it in. The rebuild
  * re-encodes every posting block at the merged corpus's avgdl, so the
  * block-max bounds the streamed appends had staled are tight again —
  * [[graft.query.Searcher]] sees the `compact_e<maxEpoch>` manifest step
  * covering every `stream_g` step and re-enables tight-bound WAND pruning.
  *
  * The swapped-in manifest carries the folded batches' `stream_g` steps
  * forward (so a replayed pre-compaction micro-batch still no-ops) plus
  * `compact_e<maxEpoch>` (so readers retire those segments from the active
  * set — their tables are now IN the base). Crash-safety: everything builds
  * under `<dir>.compact` and the swap is two directory renames; a crash
  * before the first rename leaves the original directory live (a stale
  * `.compact` is deleted and rebuilt on retry), and the two windows inside
  * the swap — between the renames, and between the second rename and the
  * old-tree delete — are closed by [[finishInterruptedSwap]], which every
  * index entry point (compact, searcher open, streamed ingest, batch build)
  * runs first. */
object Compactor {

  /** Fold all active streamed segments into a fresh base. Returns true if a
    * compaction ran (false when there was nothing to fold). */
  def compact(spark: SparkSession, indexDir: String,
              cfg: PostingsBuilder.Config): Boolean = {
    finishInterruptedSwap(indexDir)
    val io = new TableIO(indexDir)
    val batches = IndexTables.activeBatches(io)
    if (batches.isEmpty) return false
    val maxEpoch = batches.max

    // union of the immutable staged corpora, LWW per url on epoch
    val parts =
      spark.read.parquet(io.tablePath("docs"))
        .select(col("url"), col("text"), lit(-1L).as("epoch")) +:
      batches.map(b =>
        spark.read.parquet(io.tablePath(s"stream_docs/batch=$b"))
          .select(col("url"), col("text"), lit(b).as("epoch")))
    val w = Window.partitionBy(col("url")).orderBy(col("epoch").desc)
    val lww = parts.reduce(_.unionByName(_))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("url", "text")

    // full rebuild in a side dir (fresh dense ids, tight bounds at the
    // merged avgdl)
    val tmpDir = s"$indexDir.compact"
    val tio = new TableIO(tmpDir)
    tio.deleteAll()
    WebIndex.buildFromCorpus(spark, lww, tmpDir, cfg)

    // carry replay markers forward + retire the folded segments
    tio.commit(tio.committedSteps() ++
      batches.map(b => s"stream_g$b") + s"compact_e$maxEpoch")

    swapIn(indexDir, tmpDir)
    true
  }

  /** The crash-safe swap: old aside → new in → drop old. Shared by the
    * webtext and fielded compactors; every window is covered by
    * [[finishInterruptedSwap]]. */
  private[streaming] def swapIn(indexDir: String, tmpDir: String): Unit = {
    val live = Paths.get(indexDir)
    val old = Paths.get(s"$indexDir.old")
    Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmpDir), live, StandardCopyOption.ATOMIC_MOVE)
    new TableIO(old.toString).deleteAll()
  }

  /** Crash recovery for the swap's non-atomic windows — idempotent, cheap
    * (two stats on the happy path), and run from EVERY index entry point
    * ([[compact]], [[graft.query.Searcher.open]],
    * [[IncrementalIndexer.ingestBatch]],
    * [[graft.web.WebIndex.buildFromCorpus]]), not just the next
    * compaction: a crash between the two renames must not make the index
    * unreadable until someone happens to compact again.
    *
    *  - live absent, `.old` present: the crash hit between the renames.
    *    Roll FORWARD if the side build is complete (move it in, drop
    *    `.old`), otherwise roll BACK (restore `.old`).
    *  - live present, `.old` present: the crash hit after the second
    *    rename but before the old tree was deleted. The leftover `.old`
    *    is always post-swap garbage — delete it, or the next compaction's
    *    `Files.move(live, old, ATOMIC_MOVE)` fails on the non-empty
    *    target and compaction is blocked forever. */
  def finishInterruptedSwap(indexDir: String): Unit = {
    val live = Paths.get(indexDir)
    val tmp = Paths.get(s"$indexDir.compact")
    val old = Paths.get(s"$indexDir.old")
    if (!Files.exists(live) && Files.exists(old)) {
      // roll forward only if the side build reached ITS final step (plain
      // index: lineage; fielded index: fields_done) — both compactors
      // commit markers before the first rename, so a tmp that looks
      // complete here is fully marker-carried too
      val tmpComplete = Files.exists(tmp) && {
        val t = new TableIO(tmp.toString)
        t.isComplete(PostingsBuilder.FinalStep) ||
          t.isComplete(graft.index.FieldedIndex.FinalStep)
      }
      if (tmpComplete) {
        Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
        new TableIO(old.toString).deleteAll()
      } else {
        Files.move(old, live, StandardCopyOption.ATOMIC_MOVE)
      }
    } else if (Files.exists(live) && Files.exists(old)) {
      new TableIO(old.toString).deleteAll()
    }
  }
}
