package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.TableIO
import graft.model.{CorpusStats, PostingBlock, TfRow}
import graft.query.Bm25

/** Builds the on-disk inverted index from a corpus DataFrame (doc_id, text).
  *
  * Physical design for 10^12-doc scale (north_rule):
  *
  *  - **Doc-sharded index** (the Lucene/ES shard model the reference's
  *    Elasticsearch cluster uses): `doc_shard = doc_id / shardSize`. Every
  *    shard holds complete-but-short posting lists for its doc range, so a
  *    Zipf-head term ("the") contributes at most `shardSize` postings to any
  *    one partition — per-partition work is bounded BY CONSTRUCTION rather
  *    than by salting heuristics, queries are embarrassingly parallel across
  *    shards, and top-k merges through TakeOrderedAndProject. The classic
  *    term-range layout would need salted repartitionByRange + a second merge
  *    pass to defeat the same skew (SURVEY §2.6); doc-sharding makes that a
  *    non-problem and matches how the reference system actually scales.
  *  - **Single tokenization pass.** The analysis chain (UDF) is the CPU-hot
  *    stage, and snapshot steps re-execute lazy lineage, so the tf relation
  *    (term, doc_id, tf) is materialized ONCE as a staged table and every
  *    later stage reads it back: dl = Σtf per doc (no re-tokenize), stats,
  *    df, and the posting encode all derive from the same pass. Staged
  *    materialization is also what makes each step independently resumable.
  *  - **Shuffles**: tokenize+tf aggregation (1), the tf⋈dl join + encode
  *    repartition on (doc_shard, term) (2). df/stats reuse the tf table.
  *    All exact (no approximations, per north_rule).
  *  - **Encode kernel**: `mapPartitions` over rows sorted within partitions
  *    by (doc_shard, term, doc_id) — streaming, constant memory per
  *    (shard, term) group (≤ shardSize postings), emits delta-gap varbyte
  *    blocks of [[Codec.BlockSize]] with exact per-block max-impact metadata.
  *  - **Resumability**: every stage is a committed snapshot step; shard
  *    groups subdivide the postings stage. A killed build resumes from the
  *    last committed step via the [[TableIO]] manifest. Lineage rows
  *    (shard, doc range, bytes, wall-time) land in a metrics table.
  */
object PostingsBuilder {

  final case class Config(
      shardSize: Long = 1L << 20,
      shardGroups: Int = 1,
      blockSize: Int = Codec.BlockSize,
      /** test hook: simulate a crash after committing group g */
      failAfterGroup: Option[Int] = None)

  /** All committed steps present ⇒ the index is complete and reusable. */
  val FinalStep = "lineage"

  def isComplete(indexDir: String): Boolean =
    new TableIO(indexDir).isComplete(FinalStep)

  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
            cfg: Config = Config()): TableIO = {
    import spark.implicits._
    val io = new TableIO(indexDir)
    if (io.isComplete(FinalStep)) return io // idempotent re-run: no-op

    // THE tokenization pass: materialized once, reused by every later step.
    io.step("tf") {
      TextIndex.termFreqs(TextIndex.tokens(docs))
        .write.mode("overwrite").parquet(io.tablePath("tf"))
    }
    val tf = spark.read.parquet(io.tablePath("tf"))

    // dl derived from tf (Σ tf per doc == token count); zero-token docs kept
    // via left join on the doc universe.
    io.step("doc_lens") {
      docs.select(col("doc_id"))
        .join(tf.groupBy("doc_id").agg(sum("tf").as("_dl")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("_dl"), lit(0L)).as("dl"))
        .write.mode("overwrite").parquet(io.tablePath("doc_lens"))
    }
    val dl = spark.read.parquet(io.tablePath("doc_lens"))

    io.step("stats") {
      TextIndex.corpusStats(dl).write.mode("overwrite")
        .parquet(io.tablePath("stats"))
    }

    io.step("term_stats") {
      TextIndex.docFreqs(tf).write.mode("overwrite")
        .parquet(io.tablePath("term_stats"))
    }

    val stats = spark.read.parquet(io.tablePath("stats"))
      .as[CorpusStats].head()

    val enriched = tf
      .join(dl, "doc_id")
      .withColumn("doc_shard",
        (col("doc_id") / lit(cfg.shardSize)).cast("int"))
      .select(col("doc_shard"), col("term"), col("doc_id"),
        col("tf").cast("int").as("tf"), col("dl").cast("int").as("dl"))

    for (g <- 0 until cfg.shardGroups) {
      io.step(s"postings_g$g") {
        val part = enriched
          .filter(pmod(col("doc_shard"), lit(cfg.shardGroups)) === g)
          .repartition(col("doc_shard"), col("term"))
          .sortWithinPartitions("doc_shard", "term", "doc_id")
          .as[TfRow]
          .mapPartitions(encodePartition(stats.avgdl, cfg.blockSize))
        part.write.mode("overwrite").partitionBy("doc_shard")
          .parquet(io.tablePath(s"postings/group=$g"))
      }
      cfg.failAfterGroup.filter(_ == g).foreach { _ =>
        throw new RuntimeException(s"injected failure after group $g")
      }
    }

    io.step(FinalStep) {
      val snapId = io.currentSnapshotId().getOrElse("0")
      spark.read.parquet(io.tablePath("postings"))
        .groupBy(col("doc_shard"))
        .agg(
          min(col("first_doc_id")).as("doc_lo"),
          max(col("last_doc_id")).as("doc_hi"),
          sum(col("n")).cast("long").as("n_postings"),
          count(lit(1)).as("n_blocks"),
          sum(length(col("doc_ids")) + length(col("tfs")) +
            length(col("dls"))).cast("long").as("postings_bytes"),
          max(col("enc_wall_ms")).as("build_wall_ms"))
        .withColumn("snapshot_id", lit(snapId))
        .write.mode("overwrite").parquet(io.tablePath("lineage"))
    }
    io
  }

  /** Streaming block encoder: consumes (doc_shard, term, doc_id)-sorted rows,
    * emits one PostingBlock per blockSize postings of each (shard, term). */
  def encodePartition(avgdl: Double, blockSize: Int)(
      rows: Iterator[TfRow]): Iterator[PostingBlock] = new Iterator[PostingBlock] {
    private val t0 = System.currentTimeMillis()
    private val ids = new Array[Long](blockSize)
    private val tfs = new Array[Int](blockSize)
    private val dls = new Array[Int](blockSize)
    private var n = 0
    private var curShard = -1
    private var curTerm: String = null
    private var blockId = 0
    private var pending: PostingBlock = null
    private var lookahead: TfRow = null

    private def flush(): Unit = {
      if (n == 0) return
      var maxNorm = 0.0
      var maxTf = 0
      var i = 0
      while (i < n) {
        val norm = Bm25.tfNorm(tfs(i).toDouble, dls(i).toDouble, avgdl)
        if (norm > maxNorm) maxNorm = norm
        if (tfs(i) > maxTf) maxTf = tfs(i)
        i += 1
      }
      pending = PostingBlock(curShard, curTerm, blockId, n, ids(0), ids(n - 1),
        Codec.encodeDocIds(java.util.Arrays.copyOf(ids, n)),
        Codec.encodeTfs(java.util.Arrays.copyOf(tfs, n)),
        Codec.encodeTfs(java.util.Arrays.copyOf(dls, n)),
        maxNorm, maxTf, System.currentTimeMillis() - t0)
      blockId += 1
      n = 0
    }

    private def advance(): Unit = {
      while (pending == null && (lookahead != null || rows.hasNext)) {
        val r = if (lookahead != null) { val x = lookahead; lookahead = null; x }
                else rows.next()
        if (r.doc_shard != curShard || r.term != curTerm) {
          if (n > 0) { lookahead = r; flush() }
          else { curShard = r.doc_shard; curTerm = r.term; blockId = 0; buffer(r) }
        } else buffer(r)
      }
      if (pending == null && n > 0) flush()
    }

    private def buffer(r: TfRow): Unit = {
      ids(n) = r.doc_id; tfs(n) = r.tf; dls(n) = r.dl; n += 1
      if (n == blockSize) flush()
    }

    override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
    override def next(): PostingBlock = {
      if (!hasNext) throw new NoSuchElementException
      val b = pending; pending = null; b
    }
  }
}
