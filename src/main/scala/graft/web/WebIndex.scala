package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.{DocIds, PostingsBuilder}
import graft.io.TableIO

/** End-to-end index build over the `input_hint` webtext table
  * (url, warc_ts, html, text, lang) — the engine's flagship pipeline:
  *
  *   extract(html) → last-write-wins dedup by url → dense docIDs →
  *   staged corpus table → doc-sharded compressed postings → doc_map.
  *
  * Pass census (scale design): the HTML extractor and the tokenizer each run
  * EXACTLY ONCE over the corpus — extraction during the staged `docs` write
  * (fused with the dedup shuffle), tokenization during PostingsBuilder's tf
  * stage. doc_map joins the staged docs with the builder's doc_lens table
  * instead of re-tokenizing. Every stage is a committed snapshot step
  * (resume-stable: docIDs are pinned by the staged table, never re-derived). */
object WebIndex {

  /** Extract + LWW-dedup by url (ES doc-id overwrite semantics): latest
    * warc_ts wins, ties broken deterministically toward the lexicographically
    * larger html hash. */
  def extractAndDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, xxhash64(col("html")).desc)
    docs
      .withColumn("extracted", HtmlExtract.extractCol(col("html")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Build the full index; stages the extracted corpus, builds postings,
    * writes doc_map. Returns the TableIO handle. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
            cfg: PostingsBuilder.Config = PostingsBuilder.Config()): TableIO = {
    val io = new TableIO(indexDir)
    if (io.isComplete("doc_map")) return io

    // one pass: extract + dedup + dense ids, materialized (docIDs are
    // partition-layout-dependent, so they are pinned here and never
    // re-derived by later steps or resumes)
    io.step("docs") {
      DocIds.assign(extractAndDedup(docs)
        .select(col("url"), col("extracted").as("text")))
        .select(col("doc_id"), col("url"), col("text"))
        .write.mode("overwrite").parquet(io.tablePath("docs"))
    }
    val staged = spark.read.parquet(io.tablePath("docs"))

    PostingsBuilder.build(spark, staged.select("doc_id", "text"), indexDir, cfg)

    io.step("doc_map") {
      staged.select("doc_id", "url")
        .join(spark.read.parquet(io.tablePath("doc_lens")), "doc_id")
        .select(col("doc_id"), col("url"), col("dl").cast("int").as("dl"))
        .write.mode("overwrite").parquet(io.tablePath("doc_map"))
    }
    io
  }
}
