package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.index.{DocIds, PostingsBuilder, TextIndex}
import graft.io.TableIO
import graft.model.{CorpusStats, TfRow}
import graft.web.HtmlExtract

/** Structured-Streaming incremental index ingest: `readStream` over a
  * directory of input_hint parquet (new crawl files) → `foreachBatch` →
  * per-batch index append, exactly-once.
  *
  * Append model (doc-sharded index): a batch's docs get fresh dense ids past
  * the current max, so its shards are DISJOINT from existing ones — appends
  * are new posting groups, never rewrites. Global statistics merge exactly
  * (N, total_dl additive; term df additive), so query-time scores — always
  * computed from stored (tf, dl) + current stats — remain exact BM25 over
  * the union corpus. Only the stored block-max bounds go stale when avgdl
  * shifts; the Searcher detects streamed groups via the snapshot manifest
  * and switches WAND to the avgdl-independent bound tf/(tf+k1(1−b))
  * (pruning weakens, exactness holds).
  *
  * Exactly-once: each micro-batch commits a `stream_g<epoch>` snapshot step
  * LAST; a replayed batch (failure between write and Spark's checkpoint
  * commit) sees its step already committed and no-ops. Cross-batch url
  * re-crawls are appended as new docs (LWW collapse is a compaction concern,
  * not an ingest one — documented limitation this round). */
object IncrementalIndexer {

  /** Append one batch of input_hint rows to an existing complete index. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
                  batchId: Long, cfg: PostingsBuilder.Config): Unit = {
    import spark.implicits._
    val io = new TableIO(indexDir)
    val step = s"stream_g$batchId"
    if (io.committedSteps().contains(step)) return // replay → no-op
    require(io.isComplete(PostingsBuilder.FinalStep),
      s"incremental ingest requires a complete base index at $indexDir")

    val stats0 = spark.read.parquet(io.tablePath("stats")).as[CorpusStats].head()
    val nextId = spark.read.parquet(io.tablePath("doc_lens"))
      .agg(max("doc_id")).head().getLong(0) + 1

    // extract + within-batch LWW dedup (same max_by aggregate as the batch
    // build), then dense ids continuing the id space — DocIds tag/resolve
    // protocol: `_mid` is materialized in the staged write and ids are
    // derived from the files, never from a replannable in-memory layout
    val deduped = graft.web.WebIndex.extractAndDedup(batch)
      .select(col("url"), col("extracted").as("text"))
    DocIds.tag(deduped)
      .write.mode("overwrite").parquet(io.tablePath(s"stream_docs/batch=$batchId"))
    val withIds = DocIds.resolve(
      spark.read.parquet(io.tablePath(s"stream_docs/batch=$batchId")))
      .withColumn("doc_id", col("doc_id") + lit(nextId))
      .select("doc_id", "url", "text")

    // one tokenization pass for the batch — row-local tf (no token shuffle,
    // no tf⋈dl join; same kernel as the batch build)
    val docTerms = TextIndex.docTermFreqs(withIds).cache()
    val dl = docTerms.select(col("doc_id"), col("dl"))

    // merged exact stats (additive in N and total_dl)
    val batchAgg = dl.agg(count(lit(1)), sum("dl")).head()
    val n1 = batchAgg.getLong(0)
    val dl1 = if (batchAgg.isNullAt(1)) 0L else batchAgg.getLong(1)
    val nNew = stats0.n_docs + n1
    val dlNew = stats0.total_dl + dl1
    val avgdlNew = dlNew.toDouble / nNew

    // appends (disjoint doc ranges → plain parquet appends)
    dl.write.mode("append").parquet(io.tablePath("doc_lens"))
    withIds.select("doc_id", "url").join(dl, "doc_id")
      .select(col("doc_id"), col("url"), col("dl").cast("int").as("dl"))
      .write.mode("append").parquet(io.tablePath("doc_map"))

    // merged small tables: write-new-then-swap (atomic-ish on local fs; the
    // manifest commit below is what makes the batch visible)
    val dfMerged = spark.read.parquet(io.tablePath("term_stats"))
      .unionByName(docTerms.select(explode(col("tfs.term")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df")))
      .groupBy("term").agg(sum("df").as("df"))
    swapWrite(spark, dfMerged, io.tablePath("term_stats"))
    swapWrite(spark,
      Seq(CorpusStats(nNew, avgdlNew, dlNew)).toDF(),
      io.tablePath("stats"))

    // batch postings: new group (numeric, disjoint from build groups);
    // same shuffle shape as the batch build — fat per-doc rows by doc_shard,
    // explode after the exchange
    PostingsBuilder.invertStage(
      docTerms.withColumn("doc_shard",
        (col("doc_id") / lit(cfg.shardSize)).cast("int")),
      avgdlNew, cfg.blockSize)
      .write.mode("overwrite")
      .parquet(io.tablePath(s"postings/group=${1000 + batchId}"))

    docTerms.unpersist()
    io.commitStep(step) // visibility point (atomic read-modify-write)
  }

  private def swapWrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val tmp = path + ".next"
    df.write.mode("overwrite").parquet(tmp)
    val target = Paths.get(path)
    val old = Paths.get(path + ".old")
    Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), target, StandardCopyOption.ATOMIC_MOVE)
    // best-effort cleanup
    Files.walk(old).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  /** Start the streaming ingest over a directory of input_hint parquet. */
  def start(spark: SparkSession, sourceDir: String, indexDir: String,
            checkpointDir: String,
            cfg: PostingsBuilder.Config): StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("warc_ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.BinaryType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch.sparkSession, batch, indexDir, batchId, cfg)
      }
      .start()
  }
}
