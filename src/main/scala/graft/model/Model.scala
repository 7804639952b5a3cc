package graft.model

/** Core engine row types (SURVEY.md §1.4 target data model). */

/** One posting enriched with its doc length — the encode kernel's input.
  * dl is denormalized into the posting stream so posting blocks are fully
  * self-contained at query time (score = f(tf, dl, idf, avgdl); no doc-side
  * join on the query path). Costs ~1 varbyte/posting vs Lucene's 1-byte
  * lossy norm; the north_rule demands exact dl, so we pay it. */
case class TfRow(doc_shard: Int, term: String, doc_id: Long, tf: Int, dl: Int,
    pos: Array[Int] = Array.emptyIntArray)

/** A compressed posting block: up to Codec.BlockSize postings of one term
  * within one doc shard. doc_ids are delta-gap varbyte; tfs/dls varbyte.
  * max_tf_norm is the exact per-block max of tf/(tf+k1(1-b+b·dl/avgdl)) —
  * the block-max WAND pruning bound — computed with the avgdl at encode
  * time; max_tf additionally enables the avgdl-independent fallback bound
  * tf/(tf+k1(1−b)) that stays valid after streaming appends shift avgdl. enc_wall_ms is the encode task's wall
  * time (same value on every row the task emits; lineage takes max). */
case class PostingBlock(
    doc_shard: Int,
    term: String,
    block_id: Int,
    n: Int,
    first_doc_id: Long,
    last_doc_id: Long,
    doc_ids: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    max_tf_norm: Double,
    max_tf: Int,
    enc_wall_ms: Long,
    /** PFor-encoded per-doc token positions (Codec.encodePositions) —
      * present when the build stores positions (fielded text/keyword
      * chains, ES parity); empty for docs/freqs-only indexes (the webtext
      * body index — ES `index_options: freqs`, the deployment choice for a
      * 100-TB body field). */
    pos: Array[Byte] = Array.emptyByteArray)

case class TermStat(term: String, df: Long)

/** total_dl keeps the exact token sum so streaming appends can merge
  * avgdl without accumulating FP error: avgdl = total_dl / n_docs. */
case class CorpusStats(n_docs: Long, avgdl: Double, total_dl: Long)

/** Per-shard lineage/metrics row (north_rule: partition id, doc range,
  * postings bytes, build wall-time), written to the index's metrics table. */
case class LineageRow(
    doc_shard: Int,
    doc_lo: Long,
    doc_hi: Long,
    n_postings: Long,
    n_blocks: Long,
    postings_bytes: Long,
    build_wall_ms: Long,
    snapshot_id: String)

/** The webtext input row (BASELINE.json input_hint). */
case class WebDoc(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
    text: String, lang: String)

/** url → dense doc_id + exact doc length. */
case class DocMapRow(doc_id: Long, url: String, dl: Int)
