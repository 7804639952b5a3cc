package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.{DocIds, PostingsBuilder, TextIndex}
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
  * stage. doc_map joins the staged docs with the builder's doc_terms dl
  * projection instead of re-tokenizing. Every stage is a committed snapshot step
  * (resume-stable: docIDs are pinned by the staged table, never re-derived). */
object WebIndex {

  /** Extract + LWW-dedup by url (ES doc-id overwrite semantics): latest
    * warc_ts wins, ties broken deterministically toward the lexicographically
    * larger html hash.
    *
    * Scale shape: the heavy column is handled BEFORE the shuffle — html is
    * reduced to (extracted text, xxhash64) in the narrow map, so ~1KB/row
    * crosses the wire instead of raw html. The winner is picked with a
    * row_number window over (url): hash-partitioned by url, per-partition
    * sort — NOT max_by/min_by, whose non-primitive aggregation buffer
    * (struct with strings) forces sort-based aggregation with per-pass
    * sorts on BOTH the partial and final sides (measured 4.5× slower at
    * 480k docs / 8 cores). */
  def extractAndDedup(docs: DataFrame): DataFrame = {
    val pre = docs.select(col("url"), col("warc_ts"), col("lang"),
      xxhash64(col("html")).as("_hh"),
      HtmlExtract.extractCol(col("html")).as("extracted"))
    val w = Window.partitionBy(col("url"))
      .orderBy(col("warc_ts").desc, col("_hh").desc)
    pre.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_hh")
  }

  /** Build the full index; stages the extracted corpus, builds postings,
    * writes doc_map. Returns the TableIO handle. */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
            cfg: PostingsBuilder.Config = PostingsBuilder.Config()): TableIO =
    buildFromCorpus(spark,
      extractAndDedup(docs).select(col("url"), col("extracted").as("text")),
      indexDir, cfg)

  /** Build from an already-extracted (key, text) corpus — the tail of
    * [[build]], the rebuild step of [[graft.streaming.Compactor]], and the
    * CLI's crossref path (keyCol = "doi"). `keyCol` names the external
    * document identity carried into doc_map (the ES `_id` analogue). */
  def buildFromCorpus(spark: SparkSession, corpus: DataFrame, indexDir: String,
                      cfg: PostingsBuilder.Config,
                      keyCol: String = "url"): TableIO = {
    graft.streaming.Compactor.finishInterruptedSwap(indexDir)
    val io = new TableIO(indexDir)
    PostingsBuilder.ensureFormat(io) // stale-codec caches rebuild, not serve
    if (io.isComplete("doc_map") && io.isComplete(PostingsBuilder.FinalStep))
      return io

    // one pass: extract + dedup, materialized with the raw monotonic id
    // (DocIds tag/resolve protocol — ids are a pure function of the staged
    // files, never of a replannable in-memory layout)
    io.step("docs") {
      DocIds.tag(corpus.select(keyCol, "text"))
        .write.mode("overwrite").parquet(io.tablePath("docs"))
    }
    // offsets collected ONCE (tiny aggregate); every later read of the
    // staged table resolves ids as a pure projection — no repeated
    // single-partition sub-jobs
    val rawStaged = spark.read.parquet(io.tablePath("docs"))
    val staged = DocIds.resolveWith(rawStaged, DocIds.offsets(rawStaged))
      .select(col("doc_id"), col(keyCol), col("text"))

    // doc_map overlaps the builder's postings stage, and is a PROJECTION:
    // the key column rides through the tokenize pass into doc_terms
    // (TextIndex.docTermFreqs carry), so attaching dl needs no
    // corpus-sized join — at 9.6M docs the former docs⋈doc_terms shuffle
    // join cost 76-86 s of overlapped work that contended with the
    // postings stage for cores
    PostingsBuilder.build(spark, staged.select("doc_id", keyCol, "text"),
      indexDir, cfg,
      concurrentSteps = Seq("doc_map" -> { () =>
        spark.read.parquet(io.tablePath("doc_terms"))
          .select(col("doc_id"), col(keyCol), col("dl").cast("int").as("dl"))
          .write.mode("overwrite").parquet(io.tablePath("doc_map"))
      }),
      docTermFn = TextIndex.docTermFreqs(_, carry = Seq(keyCol)))
    io
  }
}
