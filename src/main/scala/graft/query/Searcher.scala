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
      val terms: java.util.HashMap[String, TermPostings]) extends Serializable

  /** A query-server handle: corpus stats loaded once, shard indexes resident
    * in executor memory. The term dictionary stays distributed (inside the
    * shard indexes) — per-query metadata is looked up, never collected
    * wholesale. */
  final class Handle private[Searcher] (val spark: SparkSession,
      val indexDir: String, val stats: CorpusStats, val tightBounds: Boolean,
      private[Searcher] val shards: RDD[ShardIndex]) {
    /** Driver-side term→df memo (misses resolved by a distributed lookup;
      * 0 = known-absent). Query-sized growth — only terms actually queried
      * ever reach the driver, never the vocabulary. */
    private[Searcher] val dfCache =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    def close(): Unit = shards.unpersist()
  }

  def open(spark: SparkSession, indexDir: String): Handle = {
    import spark.implicits._
    // a compaction crashed mid-swap must not leave the index unopenable
    // until the NEXT compaction: finish (or roll back) the swap here too
    graft.streaming.Compactor.finishInterruptedSwap(indexDir)
    val io = new TableIO(indexDir)
    val stats = graft.index.IndexTables.corpusStats(spark, io)
    val tight = tightBoundsOf(io)
    // One shuffle at open (build-once cost): co-locate each shard, stream its
    // (term, first_doc_id)-sorted blocks into a hash index, pin in memory.
    // The committed-groups view makes a crashed micro-batch's half-written
    // postings group invisible (partition-pruned before the scan).
    // partitions = total cores, NOT spark.sql.shuffle.partitions: per-query
    // work per shard is microseconds, so query jobs are task-scheduling-
    // bound — one task per core per wave is the latency-optimal width (on a
    // cluster: one serving slot per executor core, the ES shard-fan-out
    // model)
    val sorted = graft.index.IndexTables.postings(spark, io)
      .select("doc_shard", "term", "block_id", "n", "first_doc_id",
        "last_doc_id", "doc_ids", "tfs", "dls", "max_tf_norm", "max_tf",
        "enc_wall_ms")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_shard"))
      .sortWithinPartitions("doc_shard", "term", "first_doc_id")
      .as[PostingBlock]
    // MEMORY_AND_DISK, not MEMORY_ONLY: when the corpus outgrows executor
    // memory, a dropped MEMORY_ONLY partition replays the whole open()-time
    // shuffle on the NEXT QUERY (latency cliff); disk-backed spill keeps
    // evicted shards a local read away. Plain (deserialized) level, NOT
    // _SER: serialized-in-memory blocks re-deserialize the hash maps on
    // EVERY query (measured p50 93 → 257 ms).
    val shards = sorted.rdd
      .mapPartitions(buildShardIndexes, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    shards.count() // materialize now: open pays the build, queries don't
    new Handle(spark, indexDir, stats, tight, shards)
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

  /** Search via a resident handle: two short jobs over the cached shard
    * indexes, driver-side top-k merge. `chain` analyzes the query string
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

    // job 1 — query-sized df for cache misses only: k hash lookups per
    // shard, Σ over shards (skipped entirely once the handle has served the
    // query's terms before)
    val missing: Array[String] = uniqueTerms.filterNot(h.dfCache.containsKey)
    if (missing.nonEmpty) {
      val looked = h.shards.flatMap { si =>
        missing.flatMap { t =>
          val tp = si.terms.get(t)
          if (tp == null) None else Some((t, tp.df))
        }
      }.collect().groupMapReduce(_._1)(_._2)(_ + _)
      missing.foreach(t => h.dfCache.put(t, Long.box(looked.getOrElse(t, 0L))))
    }
    val dfByTerm: Map[String, Long] = uniqueTerms.iterator
      .map(t => t -> h.dfCache.get(t).longValue())
      .filter(_._2 > 0L).toMap

    val nDocs = h.stats.n_docs
    val wandQueries: Array[WandQuery] = analyzed.map { case (qid, tw) =>
      WandQuery(qid, tw.toSeq.sortBy(_._1).collect {
        case (t, w) if dfByTerm.contains(t) =>
          QueryTerm(t, Bm25.idf(nDocs, dfByTerm(t)), w)
      }.toArray)
    }.toArray
    val avgdl = h.stats.avgdl
    val tight = h.tightBounds
    val kk = k

    // job 2 — WAND fan-out: each shard scores every query from its own hash
    // index; only (qid, doc_id, score) winners leave the executor
    val hits: Array[(Int, Long, Double)] = h.shards.flatMap { si =>
      wandQueries.iterator.flatMap { q =>
        val byTerm: Map[String, IndexedSeq[PostingBlock]] =
          q.terms.iterator.flatMap { t =>
            val tp = si.terms.get(t.term)
            if (tp == null) Iterator.empty
            else Iterator.single(t.term -> ArraySeq.unsafeWrapArray(tp.blocks))
          }.toMap
        if (byTerm.isEmpty) Iterator.empty
        else BlockMaxWand.scoreShard(q, byTerm, avgdl, kk, tight)
          .iterator.map { case (doc, s) => (q.qid, doc, s) }
      }
    }.collect()

    // driver merge: per-shard top-k → global top-k under the deterministic
    // ordering (micro-rounded score desc, doc_id asc) — identical to
    // TextIndex.topK over the naive scorer
    val rows = new java.util.ArrayList[Row]()
    hits.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (qid, hs) =>
      val ranked = hs.map { case (_, doc, s) => (math.round(s * 1e6), doc) }
        .sortBy { case (x6, doc) => (-x6, doc) }
        .take(k)
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
    h.spark.createDataFrame(rows, schema).orderBy("qid", "rnk")
  }

  /** Cold-start variant: open a transient handle, search, release. */
  def search(spark: SparkSession, indexDir: String,
             rawQueries: Seq[(Int, String)], k: Int): DataFrame = {
    val h = open(spark, indexDir)
    try search(h, rawQueries, k)
    finally h.close()
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
