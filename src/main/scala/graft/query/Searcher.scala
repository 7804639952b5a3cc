package graft.query

import scala.collection.immutable.ArraySeq
import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzer
import graft.io.TableIO
import graft.model.{CorpusStats, PostingBlock}
import graft.query.BlockMaxWand.{QueryTerm, WandQuery}

/** Top-k BM25 search over the on-disk doc-sharded index (SURVEY §3.3).
  *
  * Serving model (the ES/Lucene searcher analogue): [[open]] materializes —
  * ONCE — a term-keyed block index per doc shard, kept resident in executor
  * memory as a cached RDD of [[ShardIndex]] objects. Per-query work is then
  *
  *  1. analyze the query with the indexing chain (rank-identity
  *     precondition);
  *  2. a query-sized df lookup: one narrow job over the cached shard
  *     indexes that hash-looks-up ONLY the query's terms and sums their
  *     per-shard posting counts (df(term) = Σ_shards postings, exactly the
  *     term_stats value — each doc contributes one posting per term). No
  *     full-vocabulary state ever reaches the driver: at 10^12 docs the
  *     dictionary stays sharded on the executors;
  *  3. the scoring fan-out: one narrow job where every shard runs the
  *     block-max WAND kernel over its own hash-map (shards are disjoint doc
  *     ranges — embarrassingly parallel, the ES fan-out model);
  *  4. per-shard top-k hits (k × shards × queries tuples, tiny) merge on the
  *     driver under the deterministic global ordering.
  *
  * No shuffle, no sort, no scan of non-query terms anywhere on the query
  * path — the per-query plan is two short jobs over cached partitions.
  */
object Searcher {

  /** One (shard, term)'s postings: shard-local df (= Σ block n) and the
    * blocks in global doc order (first_doc_id asc — block_id restarts per
    * posting group, so streamed appends interleave correctly). */
  final class TermPostings(val df: Long, val blocks: Array[PostingBlock])
    extends Serializable

  /** One doc shard's term → postings hash index. */
  final class ShardIndex(val shard: Int,
      val terms: java.util.HashMap[String, TermPostings]) extends Serializable {
    /** Fuzzy candidate sidecar (length buckets + class masks) — built
      * lazily on the first fuzzy/suggest query against this shard, cached
      * for the handle's lifetime (@transient: rebuilt after partition
      * eviction, never serialized). */
    @transient lazy val fuzzyDict: FuzzyDict = FuzzyDict.build(terms)
  }

  /** A query-server handle: corpus stats loaded once, shard indexes resident
    * in executor memory. The term dictionary stays distributed (inside the
    * shard indexes) — per-query metadata is looked up, never collected
    * wholesale.
    *
    * Reopen contract (the Lucene IndexReader model): a handle is a
    * snapshot of the index AT OPEN TIME. After a [[graft.streaming
    * .Compactor.compact]] swaps the directory, an old handle keeps serving
    * its cached partitions consistently, but an evicted partition would
    * recompute against the NEW directory (different doc ids) — close and
    * reopen handles after compaction rather than serving through it. */
  final class Handle private[Searcher] (val spark: SparkSession,
      val indexDir: String, val stats: CorpusStats, val tightBounds: Boolean,
      private[Searcher] val shards: RDD[ShardIndex]) extends AutoCloseable {
    /** Driver-side term→df memo (misses resolved by a distributed lookup;
      * 0 = known-absent). Query-sized growth — only terms actually queried
      * ever reach the driver, never the vocabulary. */
    private[Searcher] val dfCache =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    def close(): Unit = shards.unpersist()
  }

  /** Field-qualified key inside a multi-field shard index. NUL never occurs
    * in FIELD names (mapping identifiers), so the first NUL delimits the
    * field unambiguously whatever bytes a keyword-chain term carries. */
  val FieldSep = "\u0000"

  /** A multi-FIELD serving handle: one resident shard index whose keys are
    * `<field><NUL><term>` over the union of several per-field sub-indexes,
    * co-located by doc shard. This is the ES/Lucene segment shape — one
    * physical index holding every field's postings for its doc range — and
    * it is what makes multi-leg bool queries one narrow kernel job: all
    * legs' cursors for a doc range live in the same partition, so the
    * combined-bound WAND walks them together with θ = kth-best SUM.
    *
    * The per-field build layout stays as-is (it buys per-field build
    * concurrency and per-field stats); this open pays ONE co-locating
    * exchange per serving generation — the cost Lucene pays at segment
    * write time instead — amortized over every query served. Per-field BM25
    * statistics ride along ([[fieldStats]]) since each leg scores under its
    * own field's (N, avgdl, df). */
  final class MultiHandle private[Searcher] (val spark: SparkSession,
      val fieldStats: Map[String, CorpusStats],
      val fieldTight: Map[String, Boolean],
      private[Searcher] val shards: RDD[ShardIndex]) extends AutoCloseable {
    private[Searcher] val dfCache =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    def close(): Unit = shards.unpersist()
  }

  /** One bool/should leg: a field plus its analyzed term→weight bag.
    * `boost` is the ES per-field multiplier (`fields: ["title^2"]` /
    * bool clause `boost`): the leg's score — and every pruning bound —
    * scales by it. Folded into the cursor's idf at spec construction
    * (idf·boost), so the WAND kernel needs NO changes: score, global ub
    * and block-max bounds all carry the factor consistently, and θ
    * pruning stays exact. boost = 1.0 is bit-identical to the unboosted
    * path (IEEE ×1.0 is exact). */
  final case class MultiLeg(field: String, termWeights: Map[String, Int],
                            boost: Double = 1.0)

  /** One match_phrase clause of a bool query: a field plus the phrase's
    * analyzed occurrence list (term, tokenizer position) — the
    * [[graft.analysis.Analyzer.analyzeChainPos]] output, stopword gaps
    * preserved. `boost` scales the clause's summed idf (ES clause boost)
    * exactly like [[MultiLeg.boost]]. */
  final case class PhraseLeg(field: String, occs: Array[(String, Int)],
                             boost: Double = 1.0)

  /** Serializable per-cursor spec shipped to the scoring fan-out. */
  private final case class CursorSpec(key: String, idf: Double, weight: Int,
      avgdl: Double, tight: Boolean, leg: Int)

  /** Serializable phrase-clause spec: field-qualified keys of the phrase's
    * UNIQUE terms, the occurrence list as (unique-term index, offset
    * relative to the first occurrence), and the clause's scoring stats. */
  private final case class PhraseSpec(keys: Array[String], occTerm: Array[Int],
      occOff: Array[Int], sumIdf: Double, avgdl: Double, tight: Boolean,
      leg: Int)

  /** Open a multi-field handle over per-field sub-index directories
    * (field → dir). Includes committed streamed segments per field; each
    * field's bound mode is tracked separately. */
  def openMulti(spark: SparkSession,
                dirs: Seq[(String, String)]): MultiHandle = {
    import spark.implicits._
    val stats = dirs.map { case (f, d) =>
      f -> graft.index.IndexTables.corpusStats(spark, new TableIO(d))
    }.toMap
    val tight = dirs.map { case (f, d) =>
      f -> tightBoundsOf(new TableIO(d))
    }.toMap
    val union = dirs.map { case (f, d) =>
      graft.index.IndexTables.postings(spark, new TableIO(d))
        .select(BlockCols.head, BlockCols.tail: _*)
        .withColumn("term", concat(lit(f + FieldSep), col("term")))
    }.reduce(_.unionByName(_))
    val sorted = union
      .repartition(spark.sparkContext.defaultParallelism, col("doc_shard"))
      .sortWithinPartitions("doc_shard", "term", "first_doc_id")
      .as[PostingBlock]
    val shards = sorted.rdd
      .mapPartitions(buildShardIndexes, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    shards.count() // open pays the exchange once; queries never do
    new MultiHandle(spark, stats, tight, shards)
  }

  /** ES bool query against a multi-field handle: `legs` are should-clauses
    * (scored, summed per doc), `filter` is an optional (field, analyzed
    * values) term filter in filter context (unscored, OR over values),
    * `minShouldMatch` is the ES bool parameter counting matched clauses.
    * One narrow kernel job over the resident multi-field shards — the
    * combined-bound WAND ([[BlockMaxWand.scoreCursors]]) prunes with
    * θ = kth-best SUM, so a high-df leg's posting list is skipped through,
    * not decoded wholesale. Returns (rnk, doc_id, score_x6) under the
    * deterministic ordering. */
  def multiSearch(mh: MultiHandle, legs: Seq[MultiLeg], k: Int,
                  minShouldMatch: Int = 1,
                  filter: Option[(String, Seq[String])] = None,
                  disMaxTieBreaker: Double = -1.0,
                  phraseLegs: Seq[PhraseLeg] = Seq.empty,
                  mustNot: Option[(String, Seq[String])] = None,
                  requiredLegs: Seq[Int] = Seq.empty): DataFrame = {
    require(requiredLegs.forall(l => l >= 0 && l < 64),
      "required leg ids must fit the bool-context bitmask (0..63)")
    require(legs.forall(_.boost > 0.0) && phraseLegs.forall(_.boost > 0.0),
      "leg boost must be > 0 (a zero boost would zero the leg's bounds " +
        "but still count it for minimum_should_match — drop the leg instead)")
    val filterKeys: Array[String] = filter.toArray.flatMap { case (f, vs) =>
      vs.map(v => f + FieldSep + v)
    }
    val mustNotKeys: Array[String] = mustNot.toArray.flatMap { case (f, vs) =>
      vs.map(v => f + FieldSep + v)
    }
    val legKeys = legs.flatMap(l => l.termWeights.keys.map(l.field + FieldSep + _))
    val phraseKeys = phraseLegs.flatMap(p =>
      p.occs.map(o => p.field + FieldSep + o._1))
    val dfByKey = resolveDfs(mh.shards, mh.dfCache,
      (legKeys ++ phraseKeys ++ filterKeys ++ mustNotKeys).distinct.toArray)
    // cursor order fixed as (leg, term): the kernel's FP sum order — and so
    // the exact emitted doubles — is deterministic across runs
    val specs: Array[CursorSpec] = legs.zipWithIndex.flatMap { case (l, li) =>
      val st = mh.fieldStats(l.field)
      l.termWeights.toSeq.sortBy(_._1).collect {
        case (t, w) if dfByKey.contains(l.field + FieldSep + t) =>
          CursorSpec(l.field + FieldSep + t,
            Bm25.idf(st.n_docs, dfByKey(l.field + FieldSep + t)) * l.boost,
            w, st.avgdl, mh.fieldTight(l.field), li)
      }
    }.toArray
    // phrase clauses number their legs AFTER the should-legs; a clause with
    // any corpus-absent term matches nothing (conjunction) and is dropped
    val phraseSpecs: Array[PhraseSpec] = phraseLegs.zipWithIndex.flatMap {
      case (pl, pi) if pl.occs.nonEmpty &&
          pl.occs.forall(o => dfByKey.contains(pl.field + FieldSep + o._1)) =>
        val st = mh.fieldStats(pl.field)
        val uniq = pl.occs.map(_._1).distinct
        val tIdx = uniq.zipWithIndex.toMap
        val base = pl.occs(0)._2
        Some(PhraseSpec(uniq.map(pl.field + FieldSep + _),
          pl.occs.map(o => tIdx(o._1)), pl.occs.map(_._2 - base),
          pl.occs.iterator.map(o =>
            Bm25.idf(st.n_docs, dfByKey(pl.field + FieldSep + o._1))).sum
            * pl.boost,
          st.avgdl, mh.fieldTight(pl.field), legs.length + pi))
      case _ => None
    }.toArray
    val hasFilter = filter.isDefined
    val kk = k
    val msm = minShouldMatch
    val tb = disMaxTieBreaker
    val reqMask = requiredLegs.foldLeft(0L)((m, l) => m | (1L << l))
    val shareTheta = sys.env.getOrElse("GRAFT_SHARED_THETA", "1") != "0"
    val runId = java.util.UUID.randomUUID().toString

    val merged = treeTopK(mh.shards, kk) { si =>
      val cursors = specs.flatMap { s =>
        val tp = si.terms.get(s.key)
        if (tp == null) None
        else Some(BlockMaxWand.Cursor(ArraySeq.unsafeWrapArray(tp.blocks),
          s.idf, s.weight, s.avgdl, s.tight, s.leg))
      }
      val fblocks: Array[IndexedSeq[PostingBlock]] = filterKeys.flatMap { fk =>
        val tp = si.terms.get(fk)
        if (tp == null) None
        else Some(ArraySeq.unsafeWrapArray(tp.blocks): IndexedSeq[PostingBlock])
      }
      // a phrase clause needs EVERY unique term present in this shard
      // (conjunction); otherwise it matches nothing here
      val phraseCursors = phraseSpecs.flatMap { ps =>
        val tbs = ps.keys.map(si.terms.get)
        if (tbs.exists(_ == null)) None
        else Some(BlockMaxWand.PhraseCursor(
          ArraySeq.unsafeWrapArray(tbs.map(tp =>
            ArraySeq.unsafeWrapArray(tp.blocks): IndexedSeq[PostingBlock])),
          ps.occTerm, ps.occOff, ps.sumIdf, ps.avgdl, ps.tight, ps.leg))
      }
      // must_not exclusion lists: absence in a shard just means nothing to
      // exclude there (unlike filter, whose absence empties the shard)
      val nblocks: Array[IndexedSeq[PostingBlock]] = mustNotKeys.flatMap { nk =>
        val tp = si.terms.get(nk)
        if (tp == null) None
        else Some(ArraySeq.unsafeWrapArray(tp.blocks): IndexedSeq[PostingBlock])
      }
      if ((cursors.isEmpty && phraseCursors.isEmpty) ||
          (hasFilter && fblocks.isEmpty)) Iterator.empty
      else BlockMaxWand.scoreCursors(ArraySeq.unsafeWrapArray(cursors),
        ArraySeq.unsafeWrapArray(fblocks), kk, msm,
        if (shareTheta) BlockMaxWand.ThetaBoards.boardFor(runId) else null,
        tb, ArraySeq.unsafeWrapArray(phraseCursors),
        ArraySeq.unsafeWrapArray(nblocks), reqMask)
        .iterator.map { case (d, s) => (0, d, s) }
    }

    // single bool query ⇒ one qid (0); the shared frame builder keeps the
    // deterministic-ordering contract in ONE place
    topKFrame(mh.spark, merged).drop("qid")
  }

  private val BlockCols = Seq("doc_shard", "term", "block_id", "n",
    "first_doc_id", "last_doc_id", "doc_ids", "tfs", "dls", "max_tf_norm",
    "max_tf", "enc_wall_ms", "pos")

  def open(spark: SparkSession, indexDir: String): Handle = {
    // a compaction crashed mid-swap must not leave the index unopenable
    // until the NEXT compaction: finish (or roll back) the swap here too
    graft.streaming.Compactor.finishInterruptedSwap(indexDir)
    val io = new TableIO(indexDir)
    val stats = graft.index.IndexTables.corpusStats(spark, io)
    val tight = tightBoundsOf(io)
    val batches = graft.index.IndexTables.activeBatches(io)
    // Fast path (no active streamed segments — the compacted common case):
    // the encode stage hash-repartitions by doc_shard and writes one file
    // per task, so every postings FILE holds whole, internally-sorted
    // shards — the shard co-location a shuffle would buy already exists ON
    // DISK. Read files unsplit (split size ≥ total/width so packing, not
    // splitting, forms partitions) and build hash indexes in place: open
    // cost is a local scan, not an index-sized all-to-all — on a cluster
    // the difference between shuffling the whole postings table through
    // the network at every serving start and reading HDFS-local blocks.
    // A tiny guard verifies no shard spans partitions (the only way the
    // format property could be violated) and falls back to the shuffle
    // path. With active segments the slow path is REQUIRED: a partially
    // filled tail shard continues into the segment's files, and its blocks
    // must merge into one serving index.
    val shards0 =
      if (batches.isEmpty && sys.env.getOrElse("GRAFT_OPEN_SHUFFLE", "0") != "1")
        openUnshuffled(spark, io)
      else None
    val shards = shards0.getOrElse(openShuffled(spark, io))
    shards.count() // materialize now: open pays the build, queries don't
    new Handle(spark, indexDir, stats, tight, shards)
  }

  /** The shuffle open: co-locate each shard (base + streamed segments),
    * stream its (term, first_doc_id)-sorted blocks into a hash index.
    * partitions = total cores, NOT spark.sql.shuffle.partitions: per-query
    * work per shard is microseconds, so query jobs are task-scheduling-
    * bound — one task per core per wave is the latency-optimal width (on a
    * cluster: one serving slot per executor core, the ES fan-out model). */
  private def openShuffled(spark: SparkSession, io: TableIO): RDD[ShardIndex] = {
    import spark.implicits._
    val sorted = graft.index.IndexTables.postings(spark, io)
      .select(BlockCols.head, BlockCols.tail: _*)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_shard"))
      .sortWithinPartitions("doc_shard", "term", "first_doc_id")
      .as[PostingBlock]
    // MEMORY_AND_DISK, not MEMORY_ONLY: when the corpus outgrows executor
    // memory, a dropped MEMORY_ONLY partition replays the whole open()-time
    // shuffle on the NEXT QUERY (latency cliff); disk-backed spill keeps
    // evicted shards a local read away. Plain (deserialized) level, NOT
    // _SER: serialized-in-memory blocks re-deserialize the hash maps on
    // EVERY query (measured p50 93 → 257 ms).
    sorted.rdd
      .mapPartitions(buildShardIndexes, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** The no-shuffle open. Returns None (after cleaning up) if the
    * shard-whole-files property does not hold. */
  private def openUnshuffled(spark: SparkSession,
      io: TableIO): Option[RDD[ShardIndex]] = {
    import spark.implicits._
    val width = spark.sparkContext.defaultParallelism
    val dir = new org.apache.hadoop.fs.Path(io.tablePath("postings"))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    val totalBytes = fs.getContentSummary(dir).getLength
    // Split sizing must go through a SESSION conf: Spark 4's
    // FilePartition.maxSplitBytes reads spark.sql.files.* from the session
    // only — the equivalent-looking datasource read options are silently
    // ignored (verified in the shipped spark-sql jar), and riding on
    // whatever session value happens to be set (e.g. a bench session's
    // 4 MB) splits postings files, trips the wholeness guard below, and
    // silently demotes EVERY open to the shuffle path. A split must never
    // cut a file (shards would split with it), so the split size is the
    // pack target total/width — any single file is far smaller than that by
    // construction (files ≈ total/invertParts, invertParts ≫ width); the
    // guard below catches pathological layouts. The flip happens on a
    // CLONED session (own SQLConf, shared SparkContext/cache), so
    // concurrent jobs planning reads on the caller's session are never
    // planned with the open's split sizes — no lock, no blast radius.
    val packBytes = math.max(totalBytes / math.max(width, 1) + (1L << 20),
      1L << 22)
    val openSession = spark.newSession()
    openSession.conf.set("spark.sql.files.maxPartitionBytes",
      packBytes.toString)
    openSession.conf.set("spark.sql.files.openCostInBytes",
      (1L << 20).toString)
    val blocks = openSession.read
      .parquet(io.tablePath("postings"))
      .where(col("group") < graft.index.IndexTables.GroupBase)
      .select(BlockCols.head, BlockCols.tail: _*)
      .as[PostingBlock]
    // `.rdd` materializes the physical plan — file partitions (and so the
    // pack layout) are fixed HERE, under the clone's conf; the resulting
    // RDD belongs to the shared SparkContext, so caching and queries on
    // the caller's session are unaffected
    val shards = blocks.rdd
      .mapPartitions(buildShardIndexes, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // guard: every shard must be whole within one partition (format
    // property; violation ⇒ a doc's postings would split across serving
    // indexes and scores would be partial). Shard-count-sized, tiny.
    val ids = shards.map(_.shard).collect()
    if (sys.env.contains("GRAFT_OPEN_LOG"))
      System.err.println(s"[open] unshuffled: ${shards.getNumPartitions} " +
        s"partitions, ${ids.length} shard indexes, pack=$packBytes")
    if (ids.length == ids.distinct.length) Some(shards)
    else {
      // the fallback is correct but silently loses the no-shuffle open —
      // make it visible so a layout/conf regression can't hide behind it
      System.err.println(s"[graft] openUnshuffled guard tripped at " +
        s"${io.indexDir}: ${ids.length} shard indexes, " +
        s"${ids.distinct.length} distinct — falling back to shuffle open")
      shards.unpersist(blocking = false); None
    }
  }

  /** Stored block-max bounds are avgdl-tight unless streamed appends shifted
    * avgdl after encode; a compaction re-encodes everything at the current
    * avgdl, so bounds are tight again when a `compact_e<N>` step covers the
    * largest stream epoch (see IncrementalIndexer). */
  private[graft] def tightBoundsOf(io: TableIO): Boolean = {
    val steps = io.committedSteps()
    val streamEpochs = steps.collect {
      case s if s.startsWith("stream_g") => s.stripPrefix("stream_g").toLong
    }
    if (streamEpochs.isEmpty) true
    else {
      val compactedThrough = steps.collect {
        case s if s.startsWith("compact_e") => s.stripPrefix("compact_e").toLong
      }
      compactedThrough.nonEmpty && compactedThrough.max >= streamEpochs.max
    }
  }

  /** Group a (doc_shard, term, first_doc_id)-sorted partition stream into
    * per-shard term-keyed indexes. Memory: the partition's own blocks (the
    * same rows the old cache held, minus non-query-path columns). */
  private def buildShardIndexes(rows: Iterator[PostingBlock])
      : Iterator[ShardIndex] = new Iterator[ShardIndex] {
    private var pending: ShardIndex = null
    private var curShard = Int.MinValue
    private var curTerm: String = null
    private var curBlocks = mutable.ArrayBuffer.empty[PostingBlock]
    private var curDf = 0L
    private var map = new java.util.HashMap[String, TermPostings]()

    private def closeTerm(): Unit = {
      if (curTerm != null) {
        map.put(curTerm, new TermPostings(curDf, curBlocks.toArray))
        curBlocks = mutable.ArrayBuffer.empty[PostingBlock]
        curDf = 0L
      }
    }
    private def closeShard(): Unit = {
      closeTerm()
      if (!map.isEmpty) {
        pending = new ShardIndex(curShard, map)
        map = new java.util.HashMap[String, TermPostings]()
      }
    }
    private def advance(): Unit = {
      while (pending == null && rows.hasNext) {
        val b = rows.next()
        if (b.doc_shard != curShard) {
          closeShard(); curShard = b.doc_shard; curTerm = null
        }
        if (curTerm == null || curTerm != b.term) { closeTerm(); curTerm = b.term }
        curBlocks += b
        curDf += b.n
      }
      if (pending == null && (curTerm != null || !map.isEmpty)) {
        closeShard(); curTerm = null
      }
    }
    override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
    override def next(): ShardIndex = {
      if (!hasNext) throw new NoSuchElementException
      val s = pending; pending = null; s
    }
  }

  /** Tree-merged distributed top-k: each PARTITION folds its shards' hits
    * into per-query top-k partials, partials combine pairwise
    * (treeAggregate), and the driver receives O(queries × k) tuples at ANY
    * shard count — the ES coordinating-node fan-in model. A flat collect
    * of per-shard winners is k × shards × queries tuples, which at 10^6
    * shards (10^12 docs / 2^20 shardSize) and a 20-query batch is ~10^8
    * tuples through one driver; the tree bounds it. Hits merge on the
    * micro-rounded (score_x6, doc_id) ordering — exactly the final
    * ordering, so the merge is lossless. */
  /** Partition count above which the pairwise combine runs as an extra
    * tree stage (treeAggregate) instead of on the driver. Below it, a
    * single-stage aggregate is strictly better: the per-partition fold
    * ALREADY bounds what leaves the executors at queries × k per
    * partition, and the extra stage costs one more task-scheduling wave
    * per query (~40 ms of p50 at local[32] — measured, which is why this
    * is adaptive and not always-tree). Test seam: specs force the tree
    * path by lowering it. */
  @volatile private[graft] var treeFanInThreshold = 256

  private def treeTopK(shards: RDD[ShardIndex], k: Int)(
      perShard: ShardIndex => Iterator[(Int, Long, Double)])
      : Map[Int, Array[(Long, Long)]] = {
    val kk = k
    def mergeTop(a: Array[(Long, Long)],
                 b: Array[(Long, Long)]): Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](math.min(kk, a.length + b.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        val takeA = j >= b.length || (i < a.length &&
          (a(i)._1 > b(j)._1 || (a(i)._1 == b(j)._1 && a(i)._2 < b(j)._2)))
        if (takeA) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }
    val zero = Map.empty[Int, Array[(Long, Long)]]
    val seqOp = (acc: Map[Int, Array[(Long, Long)]], si: ShardIndex) => {
      val byQ = perShard(si).toArray.groupBy(_._1)
      byQ.foldLeft(acc) { case (m, (qid, hs)) =>
        val sorted = hs.map { case (_, d, s) => (math.round(s * 1e6), d) }
          .sortBy { case (x6, d) => (-x6, d) }.take(kk)
        m.updated(qid,
          m.get(qid).map(mergeTop(_, sorted)).getOrElse(sorted))
      }
    }
    val combOp = (m1: Map[Int, Array[(Long, Long)]],
                  m2: Map[Int, Array[(Long, Long)]]) =>
      (m1.keySet ++ m2.keySet).iterator.map { q =>
        q -> ((m1.get(q), m2.get(q)) match {
          case (Some(a), Some(b)) => mergeTop(a, b)
          case (Some(a), None) => a
          case (None, Some(b)) => b
          case _ => Array.empty[(Long, Long)]
        })
      }.toMap
    val parts = shards.getNumPartitions
    if (parts <= treeFanInThreshold) shards.aggregate(zero)(seqOp, combOp)
    else shards.treeAggregate(zero)(seqOp, combOp,
      depth = math.max(2, (math.log(parts.toDouble) / math.log(64.0)).ceil.toInt))
  }

  /** Build the (qid, rnk, doc_id, score_x6) frame from merged top-k. */
  private def topKFrame(spark: SparkSession,
      merged: Map[Int, Array[(Long, Long)]]): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    merged.toSeq.sortBy(_._1).foreach { case (qid, ranked) =>
      var i = 0
      while (i < ranked.length) {
        rows.add(Row(qid.toLong, (i + 1).toLong, ranked(i)._2, ranked(i)._1))
        i += 1
      }
    }
    val schema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("rnk", LongType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("score_x6", LongType, nullable = false)))
    spark.createDataFrame(rows, schema).orderBy("qid", "rnk")
  }

  /** Search via a resident handle: two short jobs over the cached shard
    * indexes, tree-merged top-k. `chain` analyzes the query string
    * with the target field's analyzer (reference semantics: ES analyzes
    * query text with the queried field's mapped chain,
    * elastic/settings.go:87-138) — default is the stopword text chain the
    * single-field indexes use. */
  def search(h: Handle, rawQueries: Seq[(Int, String)], k: Int,
             chain: String => Array[String] = Analyzer.analyzeStop): DataFrame = {
    // analyzed terms with query-occurrence weights (Lucene: a repeated query
    // term contributes once per occurrence)
    val analyzed: Seq[(Int, Map[String, Int])] = rawQueries.map { case (qid, q) =>
      qid -> chain(q).groupBy(identity).view.mapValues(_.length).toMap
    }
    val uniqueTerms: Array[String] = analyzed.flatMap(_._2.keys).distinct.toArray
    val dfByTerm: Map[String, Long] = resolveDfs(h, uniqueTerms)

    val nDocs = h.stats.n_docs
    val wandQueries: Array[WandQuery] = analyzed.map { case (qid, tw) =>
      WandQuery(qid, tw.toSeq.sortBy(_._1).collect {
        case (t, w) if dfByTerm.contains(t) =>
          QueryTerm(t, Bm25.idf(nDocs, dfByTerm(t)), w)
      }.toArray)
    }.toArray
    runWand(h, wandQueries, k)
  }

  /** WAND fan-out + tree merge over a handle's resident shards: each shard
    * scores every query from its own hash index; partition-level top-k
    * partials combine pairwise, so only O(queries × k) tuples ever reach
    * the driver (treeTopK). Unique run id: shards sharing a JVM share one
    * θ board per query (BlockMaxWand.ThetaBoards) — head-term pruning
    * tightens as soon as ANY co-resident shard fills its heap.
    * GRAFT_SHARED_THETA=0 disables (A/B benchmarking knob). */
  private def runWand(h: Handle, wandQueries: Array[WandQuery],
      k: Int): DataFrame = {
    val avgdl = h.stats.avgdl
    val tight = h.tightBounds
    val kk = k
    val shareTheta = sys.env.getOrElse("GRAFT_SHARED_THETA", "1") != "0"
    val runId = java.util.UUID.randomUUID().toString
    val merged = treeTopK(h.shards, kk) { si =>
      wandQueries.iterator.flatMap { q =>
        val byTerm: Map[String, IndexedSeq[PostingBlock]] =
          q.terms.iterator.flatMap { t =>
            val tp = si.terms.get(t.term)
            if (tp == null) Iterator.empty
            else Iterator.single(t.term -> ArraySeq.unsafeWrapArray(tp.blocks))
          }.toMap
        if (byTerm.isEmpty) Iterator.empty
        else BlockMaxWand.scoreShard(q, byTerm, avgdl, kk, tight,
          if (shareTheta) BlockMaxWand.ThetaBoards.boardFor(s"$runId/${q.qid}")
          else null)
          .iterator.map { case (doc, s) => (q.qid, doc, s) }
      }
    }
    topKFrame(h.spark, merged)
  }

  /** ES match with `fuzziness` (the Lucene FuzzyQuery rewrite): each
    * analyzed query term expands to the dictionary terms within its edit
    * budget (AUTO = 0/1/2 by term length, or the explicit `fuzziness`,
    * capped at 2), selected deterministically by (distance asc, df desc,
    * term asc) up to `maxExpansions` (ES default 50); each expansion then
    * scores as an ordinary WAND cursor whose idf is pre-multiplied by the
    * fuzzy boost 1 − d/min(|q|,|t|) — the bool-of-expansions rewrite, so
    * the block-max pruning, θ boards and tree merge all apply unchanged.
    *
    * Expansion runs against each shard's [[FuzzyDict]] sidecar — length
    * bands + class-mask popcount prefilters, DP only on survivors — NOT a
    * full-dictionary sweep, so per-query cost tracks the ±e length bands,
    * not the vocabulary (FuzzyProbe measures the gap; GRAFT_FUZZY_SWEEP=1
    * re-enables the sweep as the A/B reference). Lucene intersects an FST
    * with a Levenshtein automaton instead — sublinear in band size, the
    * documented next rung; at 10^12 docs either structure belongs NEXT TO
    * each shard's hash index (the dictionaries stay sharded on executors;
    * nothing vocabulary-sized reaches the driver; collected rows are
    * query-terms × ≤maxExpansions × shard partials). */
  /** Dictionary candidates per (term, edit budget): one distributed job
    * over the resident shard indexes — exact (0-edit) terms use the
    * hash lookup, fuzzy terms probe the shard's [[FuzzyDict]]; per-shard
    * partial dfs add. Selection is the deterministic Lucene order
    * (distance asc, df desc, term asc), capped at `max`. Shared by the
    * fuzzy-match rewrite and the term suggester. */
  private def fuzzyCandidates(h: Handle, uniq: Array[(String, Int)],
      max: Int): Map[String, Array[(String, Long, Int)]] = {
    val sweep = sys.props.getOrElse("graft.fuzzy.sweep",
      sys.env.getOrElse("GRAFT_FUZZY_SWEEP", "0")) == "1"
    val rows: Array[(String, String, Long, Int)] = h.shards.flatMap { si =>
      val out = mutable.ArrayBuffer.empty[(String, String, Long, Int)]
      uniq.foreach { case (q, maxE) =>
        if (maxE == 0) {
          val tp = si.terms.get(q)
          if (tp != null) out += ((q, q, tp.df, 0))
        } else if (sweep) {
          // the retired full-vocab sweep, kept ONLY as the A/B reference
          // (GRAFT_FUZZY_SWEEP=1): DP against every dictionary key
          val it = si.terms.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val d = Fuzzy.damerau(q, e.getKey, maxE)
            if (d <= maxE) out += ((q, e.getKey, e.getValue.df, d))
          }
        } else {
          si.fuzzyDict.candidates(q, maxE).foreach { case (t, df, d) =>
            out += ((q, t, df, d))
          }
        }
      }
      out.iterator
    }.collect()
    rows.groupBy(_._1).map { case (q, rs) =>
      val byTerm = rs.groupBy(_._2).map { case (t, xs) =>
        (t, xs.map(_._3).sum, xs.head._4) // dfs add; distance is global
      }.toArray
      q -> byTerm.sortBy { case (t, df, d) => (d, -df, t) }
        .take(max)
    }
  }

  /** ES term suggester (`suggest_mode: missing`, the default): for each
    * analyzed input term ABSENT from the dictionary, the closest
    * dictionary terms within its AUTO edit budget, ranked (distance asc,
    * df desc, term asc) — Lucene DirectSpellChecker's candidate order —
    * top `size`. Present terms produce no suggestions (that is what
    * `missing` means). Returns (input, rnk, suggestion, df, distance). */
  def termSuggest(h: Handle, text: String, size: Int,
      chain: String => Array[String] = Analyzer.analyzeStop): DataFrame = {
    import h.spark.implicits._
    val terms = chain(text).distinct.sorted
    val present = resolveDfs(h, terms.toArray)
    val missing = terms.filterNot(present.contains)
      .map(t => t -> Fuzzy.autoEdits(t)).filter(_._2 > 0).toArray
    // the common all-terms-present case: no distributed scan at all
    val cands =
      if (missing.isEmpty) Map.empty[String, Array[(String, Long, Int)]]
      else fuzzyCandidates(h, missing, size)
    val rows = missing.flatMap { case (q, _) =>
      cands.getOrElse(q, Array.empty).zipWithIndex.map {
        case ((t, df, d), i) => (q, (i + 1).toLong, t, df, d.toLong)
      }
    }.toSeq
    rows.toDF("input", "rnk", "suggestion", "df", "distance")
      .orderBy("input", "rnk")
  }

  def fuzzySearch(h: Handle, rawQueries: Seq[(Int, String)], k: Int,
      chain: String => Array[String] = Analyzer.analyzeStop,
      fuzziness: Int = -1, maxExpansions: Int = 50): DataFrame = {
    val analyzed: Seq[(Int, Map[String, Int])] = rawQueries.map { case (qid, q) =>
      qid -> chain(q).groupBy(identity).view.mapValues(_.length).toMap
    }
    val uniq: Array[(String, Int)] = analyzed.flatMap(_._2.keys).distinct.sorted
      .map(t => t -> (if (fuzziness >= 0) math.min(fuzziness, 2)
                      else Fuzzy.autoEdits(t))).toArray
    val cands = fuzzyCandidates(h, uniq, maxExpansions)
    val nDocs = h.stats.n_docs
    // cursor order (query term, expansion term): deterministic FP sums
    val wandQueries: Array[WandQuery] = analyzed.map { case (qid, tw) =>
      WandQuery(qid, tw.toSeq.sortBy(_._1).flatMap { case (q, w) =>
        cands.getOrElse(q, Array.empty).sortBy(_._1).map { case (t, df, dd) =>
          QueryTerm(t, Fuzzy.boost(q, t, dd) * Bm25.idf(nDocs, df), w)
        }
      }.toArray)
    }.toArray
    runWand(h, wandQueries, k)
  }

  /** Cold-start variant: open a transient handle, search, release. */
  def search(spark: SparkSession, indexDir: String,
             rawQueries: Seq[(Int, String)], k: Int): DataFrame = {
    val h = open(spark, indexDir)
    try search(h, rawQueries, k)
    finally h.close()
  }

  /** Bounded public df lookup (the [[resolveDfs]] cache path) for query
    * planners that rank candidate terms by idf before building the real
    * query (more_like_this term selection). Input size is the caller's
    * contract — here always one document's distinct terms. */
  def termDfs(h: Handle, terms: Array[String]): Map[String, Long] =
    resolveDfs(h, terms)

  /** Query-sized df lookup for cache misses only: |terms| hash lookups per
    * shard, Σ over shards (skipped entirely once the handle has served the
    * terms before). Returns only terms with df > 0. */
  private def resolveDfs(h: Handle,
      uniqueTerms: Array[String]): Map[String, Long] =
    resolveDfs(h.shards, h.dfCache, uniqueTerms)

  private def resolveDfs(shards: RDD[ShardIndex],
      dfCache: java.util.concurrent.ConcurrentHashMap[String, java.lang.Long],
      uniqueTerms: Array[String]): Map[String, Long] = {
    val missing: Array[String] = uniqueTerms.filterNot(dfCache.containsKey)
    if (missing.nonEmpty) {
      val looked = shards.flatMap { si =>
        missing.flatMap { t =>
          val tp = si.terms.get(t)
          if (tp == null) None else Some((t, tp.df))
        }
      }.collect().groupMapReduce(_._1)(_._2)(_ + _)
      missing.foreach(t => dfCache.put(t, Long.box(looked.getOrElse(t, 0L))))
    }
    uniqueTerms.iterator
      .map(t => t -> dfCache.get(t).longValue())
      .filter(_._2 > 0L).toMap
  }

  /** Per-doc BM25 contributions of a weighted term bag against this
    * handle's index: (doc_id, contrib) with contrib = weight · idf ·
    * tfNorm under THIS index's stats — the building block of multi-field
    * (ES bool/should) scoring, where per-field score lists must be summed
    * across sub-indexes rather than top-k'd per field (a doc can win the
    * sum without being in any single field's top-k). Distributed end to
    * end: one narrow decode job per handle, rows stay on executors for the
    * downstream sum. The doubles are the WAND kernel's own (same
    * [[Bm25.idf]]/[[Bm25.tfNorm]] calls), so micro-rounded sums agree with
    * the oracle's exactly like the single-field paths. */
  def contribs(h: Handle, termWeights: Map[String, Int],
               boost: Double = 1.0): DataFrame = {
    import h.spark.implicits._
    val dfByTerm = resolveDfs(h, termWeights.keys.toArray)
    val n = h.stats.n_docs
    val avgdl = h.stats.avgdl
    // boost folds into idf BEFORE the weight multiply — the same FP order
    // as the kernel's pre-multiplied cursor idf, so micro-rounded sums
    // agree exactly; ×1.0 is the IEEE identity (unboosted callers
    // unchanged bit-for-bit)
    val idfW: Array[(String, Double)] = termWeights.toArray.collect {
      case (t, w) if dfByTerm.contains(t) =>
        t -> w * (Bm25.idf(n, dfByTerm(t)) * boost)
    }
    h.shards.flatMap { si =>
      idfW.iterator.flatMap { case (t, iw) =>
        val tp = si.terms.get(t)
        if (tp == null) Iterator.empty
        else tp.blocks.iterator.flatMap { b =>
          val ids = graft.index.Codec.decodeDocIds(b.doc_ids, b.n)
          val tfs = graft.index.Codec.decodeTfs(b.tfs, b.n)
          val dls = graft.index.Codec.decodeTfs(b.dls, b.n)
          (0 until b.n).iterator.map(i =>
            (ids(i), iw * Bm25.tfNorm(tfs(i).toDouble, dls(i).toDouble, avgdl)))
        }
      }
    }.toDF("doc_id", "contrib")
  }

  /** ES `_explain` backbone: the per-term BM25 decomposition of ONE doc
    * under this handle's stats — (term, weight, tf, df, dl, idf, tf_norm,
    * contrib) for each query term present in the doc. The doubles are the
    * kernel's own [[Bm25]] calls in the kernel's FP order
    * ((w·idf)·tfNorm), so Σ contrib micro-rounds to exactly the score
    * every query path serves. Distributed lookup (the doc lives in one
    * shard; block min/max prune the decode), driver receives ≤ |terms|
    * rows. */
  def explainDoc(h: Handle, termWeights: Map[String, Int],
                 docId: Long): DataFrame = {
    import h.spark.implicits._
    val dfByTerm = resolveDfs(h, termWeights.keys.toArray)
    val n = h.stats.n_docs
    val avgdl = h.stats.avgdl
    val terms = termWeights.toArray.collect {
      case (t, w) if dfByTerm.contains(t) => (t, w, dfByTerm(t))
    }
    h.shards.flatMap { si =>
      terms.iterator.flatMap { case (t, w, df) =>
        val tp = si.terms.get(t)
        if (tp == null) Iterator.empty
        else tp.blocks.iterator
          .filter(b => b.first_doc_id <= docId && docId <= b.last_doc_id)
          .flatMap { b =>
            val ids = graft.index.Codec.decodeDocIds(b.doc_ids, b.n)
            val tfs = graft.index.Codec.decodeTfs(b.tfs, b.n)
            val dls = graft.index.Codec.decodeTfs(b.dls, b.n)
            (0 until b.n).iterator.filter(i => ids(i) == docId).map { i =>
              val idf = Bm25.idf(n, df)
              val tfn = Bm25.tfNorm(tfs(i).toDouble, dls(i).toDouble, avgdl)
              (t, w, tfs(i).toLong, df, dls(i).toLong, idf, tfn,
                (w * idf) * tfn)
            }
          }
      }
    }.toDF("term", "weight", "tf", "df", "dl", "idf", "tf_norm", "contrib")
  }

  /** Full per-doc phrase score list against this handle's index — the
    * naive twin of a phrase CLAUSE: every conjunction doc is position-
    * confirmed and scored (exact but unpruned; the production path is the
    * PhraseIter clause inside the combined-bound WAND). Emits (doc_id,
    * contrib) for pf > 0 docs only, so a downstream leg count sees phrase
    * clauses exactly like match legs. Distributed end to end. */
  def phraseContribs(h: Handle, occs: Array[(String, Int)],
                     boost: Double = 1.0): DataFrame = {
    import h.spark.implicits._
    val empty = h.spark.emptyDataset[(Long, Double)].toDF("doc_id", "contrib")
    if (occs.isEmpty) return empty
    val dfByTerm = resolveDfs(h, occs.map(_._1).distinct)
    if (!occs.forall(o => dfByTerm.contains(o._1))) return empty
    val nDocs = h.stats.n_docs
    val avgdl = h.stats.avgdl
    val sumIdf =
      occs.iterator.map(o => Bm25.idf(nDocs, dfByTerm(o._1))).sum * boost
    h.shards.flatMap { si =>
      val lookup: String => Array[PostingBlock] = t => {
        val tp = si.terms.get(t)
        if (tp == null) null else tp.blocks
      }
      Phrase.scoreShard(lookup, occs, sumIdf, avgdl, Int.MaxValue).iterator
    }.toDF("doc_id", "contrib")
  }

  /** ES match_phrase against a positioned index: analyze each phrase with
    * the field's chain keeping tokenizer positions, then run the exact
    * phrase kernel ([[Phrase.scoreShard]]) per shard — one narrow job over
    * the resident shard indexes, candidates bounded by the rarest term's
    * postings. Returns (qid, rnk, doc_id, score_x6) under the
    * deterministic ordering; phrases with any corpus-absent term match
    * nothing (conjunction). */
  def phraseSearch(h: Handle, rawQueries: Seq[(Int, String)], k: Int,
      chain: String => Array[(String, Int)]): DataFrame = {
    val analyzed: Seq[(Int, Array[(String, Int)])] =
      rawQueries.map { case (qid, q) => qid -> chain(q) }
    val uniqueTerms = analyzed.flatMap(_._2.map(_._1)).distinct.toArray
    val dfByTerm = resolveDfs(h, uniqueTerms)
    val nDocs = h.stats.n_docs
    val avgdl = h.stats.avgdl
    val kk = k
    val pqs: Array[(Int, Array[(String, Int)], Double)] = analyzed.collect {
      case (qid, occs) if occs.nonEmpty &&
          occs.forall(o => dfByTerm.contains(o._1)) =>
        (qid, occs,
          occs.iterator.map(o => Bm25.idf(nDocs, dfByTerm(o._1))).sum)
    }.toArray

    val merged = treeTopK(h.shards, kk) { si =>
      pqs.iterator.flatMap { case (qid, occs, sumIdf) =>
        val lookup: String => Array[PostingBlock] = t => {
          val tp = si.terms.get(t)
          if (tp == null) null else tp.blocks
        }
        Phrase.scoreShard(lookup, occs, sumIdf, avgdl, kk)
          .iterator.map { case (doc, s) => (qid, doc, s) }
      }
    }
    topKFrame(h.spark, merged)
  }

  /** ES span_near (in_order) — ordered proximity: each query is (qid, raw
    * text, slop); the analyzed tokens in order are the span_term clauses.
    * Same distributed shape as [[phraseSearch]] (the conjunction over the
    * rarest clause's postings is the selective step; positions decode only
    * on conjunction docs), the kernel is
    * [[Phrase.scoreShardSpanNear]]'s greedy-minimal ordered matcher
    * (`inOrder = false` swaps in the anchored-window unordered matcher,
    * [[Phrase.scoreShardSpanNearUnordered]]). idf
    * sums over clause terms, duplicates included (SpanWeight collects
    * from every clause). Returns (qid, rnk, doc_id, score_x6). */
  def spanNearSearch(h: Handle, rawQueries: Seq[(Int, String, Int)], k: Int,
      chain: String => Array[String], inOrder: Boolean = true): DataFrame = {
    val analyzed: Seq[(Int, Array[String], Int)] =
      rawQueries.map { case (qid, q, slop) => (qid, chain(q), slop) }
    val uniqueTerms = analyzed.flatMap(_._2).distinct.toArray
    val dfByTerm = resolveDfs(h, uniqueTerms)
    val nDocs = h.stats.n_docs
    val avgdl = h.stats.avgdl
    val kk = k
    val pqs: Array[(Int, Array[String], Int, Double)] = analyzed.collect {
      case (qid, ts, slop) if ts.nonEmpty && ts.forall(dfByTerm.contains) =>
        (qid, ts, slop,
          ts.iterator.map(t => Bm25.idf(nDocs, dfByTerm(t))).sum)
    }.toArray

    val ordered = inOrder
    val merged = treeTopK(h.shards, kk) { si =>
      pqs.iterator.flatMap { case (qid, ts, slop, sumIdf) =>
        val lookup: String => Array[PostingBlock] = t => {
          val tp = si.terms.get(t)
          if (tp == null) null else tp.blocks
        }
        val hits =
          if (ordered)
            Phrase.scoreShardSpanNear(lookup, ts, slop, sumIdf, avgdl, kk)
          else
            Phrase.scoreShardSpanNearUnordered(lookup, ts, slop, sumIdf,
              avgdl, kk)
        hits.iterator.map { case (doc, s) => (qid, doc, s) }
      }
    }
    topKFrame(h.spark, merged)
  }

  /** ES match_phrase_prefix (Lucene MultiPhrasePrefixQuery rewritten to a
    * MultiPhraseQuery): the phrase's LAST token position becomes a slot of
    * up to max_expansions dictionary terms sharing its prefix (supplied by
    * `expand` in term order — the Lucene rewrite collection order), every
    * other position stays an exact occurrence. Scoring follows
    * MultiPhraseWeight: idf sums over the FULL term set (fixed occurrences
    * + every expansion, df from the dictionary), tfNorm over the union
    * phraseFreq. Queries whose fixed terms are corpus-absent, or whose
    * prefix expands to nothing, match nothing (conjunction). Returns
    * (qid, rnk, doc_id, score_x6). */
  def phrasePrefixSearch(h: Handle, rawQueries: Seq[(Int, String)], k: Int,
      chain: String => Array[(String, Int)],
      expand: String => Seq[(String, Long)]): DataFrame = {
    val analyzed: Seq[(Int, Array[(String, Int)])] =
      rawQueries.map { case (qid, q) => qid -> chain(q) }
    val fixedTerms =
      analyzed.flatMap(_._2.dropRight(1).map(_._1)).distinct.toArray
    val dfByTerm = resolveDfs(h, fixedTerms)
    val nDocs = h.stats.n_docs
    val avgdl = h.stats.avgdl
    val kk = k
    val pqs: Array[(Int, Array[(Array[String], Int)], Double)] =
      analyzed.collect {
        case (qid, occs) if occs.nonEmpty &&
            occs.dropRight(1).forall(o => dfByTerm.contains(o._1)) =>
          val (lastTerm, lastPos) = occs.last
          val exps = expand(lastTerm)
          if (exps.isEmpty) None
          else {
            val slots: Array[(Array[String], Int)] =
              occs.dropRight(1).map { case (t, p) => (Array(t), p) } :+
                (exps.map(_._1).toArray, lastPos)
            val sumIdf =
              occs.dropRight(1).iterator
                .map(o => Bm25.idf(nDocs, dfByTerm(o._1))).sum +
              exps.iterator.map { case (_, df) => Bm25.idf(nDocs, df) }.sum
            Some((qid, slots, sumIdf))
          }
      }.flatten.toArray

    val merged = treeTopK(h.shards, kk) { si =>
      pqs.iterator.flatMap { case (qid, slots, sumIdf) =>
        val lookup: String => Array[PostingBlock] = t => {
          val tp = si.terms.get(t)
          if (tp == null) null else tp.blocks
        }
        Phrase.scoreShardMulti(lookup, slots, sumIdf, avgdl, kk)
          .iterator.map { case (doc, s) => (qid, doc, s) }
      }
    }
    topKFrame(h.spark, merged)
  }

  /** ES term-query analogue (filter context — set-valued, no scoring): all
    * docs whose indexed field contains one of the PRE-ANALYZED terms. One
    * narrow job over the resident shard indexes; the result stays a
    * distributed (term, doc_id) DataFrame because a term's posting list is
    * corpus-sized at scale (a keyword-field lookup like DOI yields a
    * handful of rows, a year-field lookup yields millions). */
  def termDocs(h: Handle, terms: Seq[String]): DataFrame = {
    import h.spark.implicits._
    val ts = terms.toArray
    h.shards.flatMap { si =>
      ts.iterator.flatMap { t =>
        val tp = si.terms.get(t)
        if (tp == null) Iterator.empty
        else tp.blocks.iterator.flatMap(b =>
          graft.index.Codec.decodeDocIds(b.doc_ids, b.n).iterator
            .map(d => (t, d)))
      }
    }.toDF("term", "doc_id")
  }
}
