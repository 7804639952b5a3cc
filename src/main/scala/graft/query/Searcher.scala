package graft.query

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.TextIndex
import graft.io.TableIO
import graft.model.{CorpusStats, PostingBlock, TermStat}
import graft.query.BlockMaxWand.{QueryTerm, WandQuery}

/** Top-k BM25 search over the on-disk doc-sharded index (SURVEY §3.3).
  *
  * Query lifecycle at scale:
  *  1. analyze the query with the same chain as indexing (rank-identity
  *     precondition);
  *  2. fetch df for the query's terms from the term_stats table and N/avgdl
  *     from the stats table — query-sized metadata, broadcast to all tasks;
  *  3. scan ONLY the query terms' posting blocks: the postings files are
  *     (term, block_id)-sorted within each shard, so the `term IN (...)`
  *     predicate is pushed into the Parquet scan and prunes row groups via
  *     min/max stats (and dictionary filters) — the scan is proportional to
  *     the query's posting data, not the corpus;
  *  4. each shard runs the block-max WAND kernel independently (shards are
  *     disjoint doc ranges — embarrassingly parallel, the ES fan-out model);
  *  5. per-shard top-k hits (tiny: k × shards × queries rows) merge through
  *     one final ordered limit (TakeOrderedAndProject-shaped).
  */
object Searcher {

  /** A query-server handle: corpus stats and the term dictionary loaded
    * once and kept resident, the postings table cached in executor memory
    * (what a serving node does — the per-query work is then dictionary
    * lookups + an in-memory pruned scan only). */
  final class Handle private[Searcher] (val spark: SparkSession,
      val indexDir: String, val stats: CorpusStats,
      val dfByTerm: Map[String, Long], val tightBounds: Boolean,
      private[Searcher] val postings: DataFrame) {
    def close(): Unit = postings.unpersist()
  }

  def open(spark: SparkSession, indexDir: String): Handle = {
    import spark.implicits._
    val io = new TableIO(indexDir)
    val stats = spark.read.parquet(io.tablePath("stats")).as[CorpusStats].head()
    val dict = spark.read.parquet(io.tablePath("term_stats"))
      .as[TermStat].collect().map(t => t.term -> t.df).toMap
    val tight = !io.committedSteps().exists(_.startsWith("stream_"))
    val postings = spark.read.parquet(io.tablePath("postings")).cache()
    new Handle(spark, indexDir, stats, dict, tight, postings)
  }

  /** Search via a resident handle (no per-query metadata jobs; in-memory
    * postings scan). */
  def search(h: Handle, rawQueries: Seq[(Int, String)], k: Int): DataFrame =
    run(h.spark, h.stats, h.dfByTerm, h.tightBounds, h.postings, rawQueries, k)

  /** Search the 20-query set (or any (qid, raw query) seq): returns
    * (qid, rnk, doc_id, score_x6) under the deterministic global ordering —
    * identical to TextIndex.topK over the naive scorer. Cold-start variant:
    * loads metadata (uncached postings), then delegates. */
  def search(spark: SparkSession, indexDir: String,
             rawQueries: Seq[(Int, String)], k: Int): DataFrame = {
    import spark.implicits._
    val io = new TableIO(indexDir)
    val stats = spark.read.parquet(io.tablePath("stats")).as[CorpusStats].head()
    val dict = spark.read.parquet(io.tablePath("term_stats"))
      .as[TermStat].collect().map(t => t.term -> t.df).toMap
    val tight = !io.committedSteps().exists(_.startsWith("stream_"))
    run(spark, stats, dict, tight,
      spark.read.parquet(io.tablePath("postings")), rawQueries, k)
  }

  private def run(spark: SparkSession, stats: CorpusStats,
                  dfAll: Map[String, Long], tightBounds: Boolean,
                  postings: DataFrame,
                  rawQueries: Seq[(Int, String)], k: Int): DataFrame = {
    import spark.implicits._

    // analyzed terms with query-occurrence weights (Lucene: a repeated query
    // term contributes once per occurrence)
    val analyzed: Seq[(Int, Map[String, Int])] = rawQueries.map { case (qid, q) =>
      qid -> Analyzer.analyzeStop(q).groupBy(identity).view.mapValues(_.length).toMap
    }
    val uniqueTerms = analyzed.flatMap(_._2.keys).distinct

    val dfByTerm: Map[String, Long] =
      uniqueTerms.flatMap(t => dfAll.get(t).map(t -> _)).toMap

    val wandQueries: Array[WandQuery] = analyzed.map { case (qid, tw) =>
      WandQuery(qid, tw.toSeq.sortBy(_._1).collect {
        case (t, w) if dfByTerm.contains(t) =>
          QueryTerm(t, Bm25.idf(stats.n_docs, dfByTerm(t)), w)
      }.toArray)
    }.toArray
    val bcQueries = spark.sparkContext.broadcast(wandQueries)
    val avgdl = stats.avgdl
    // (tightBounds: streamed appends shift avgdl after blocks were encoded —
    // fall back to the avgdl-independent block bounds then; see BlockMaxWand)

    val hits = postings
      .filter(col("term").isin(uniqueTerms: _*))
      .select("doc_shard", "term", "block_id", "n", "first_doc_id",
        "last_doc_id", "doc_ids", "tfs", "dls", "max_tf_norm", "max_tf",
        "enc_wall_ms")
      .repartition(col("doc_shard"))
      // sort by first_doc_id, NOT block_id: a shard that spans multiple
      // posting groups (base shard groups + streamed appends) restarts
      // block_id per group, and the WAND cursor requires blocks of a
      // (shard, term) in global doc order — ranges are disjoint, so
      // first_doc_id totally orders them
      .sortWithinPartitions("doc_shard", "term", "first_doc_id")
      .as[PostingBlock]
      .mapPartitions { it =>
        new ShardRunner(it, bcQueries.value, avgdl, k, tightBounds)
      }
      .toDF("qid", "doc_id", "score")

    TextIndex.topK(hits, k)
  }

  /** Streams (shard, term, block)-sorted blocks; on each shard boundary runs
    * every query's WAND kernel over that shard's blocks. Memory is bounded by
    * one shard's query-term blocks (≤ |q terms| × shardSize/blockSize). */
  private final class ShardRunner(rows: Iterator[PostingBlock],
      queries: Array[WandQuery], avgdl: Double, k: Int, tightBounds: Boolean)
      extends Iterator[(Int, Long, Double)] {
    private val out = mutable.Queue.empty[(Int, Long, Double)]
    private var curShard = Int.MinValue
    private val buf = mutable.Map.empty[String, mutable.ArrayBuffer[PostingBlock]]

    private def runShard(): Unit = {
      if (buf.isEmpty) return
      val byTerm: Map[String, IndexedSeq[PostingBlock]] =
        buf.view.mapValues(_.toIndexedSeq).toMap
      var qi = 0
      while (qi < queries.length) {
        val q = queries(qi)
        val top = BlockMaxWand.scoreShard(q, byTerm, avgdl, k, tightBounds)
        var i = 0
        while (i < top.length) { out.enqueue((q.qid, top(i)._1, top(i)._2)); i += 1 }
        qi += 1
      }
      buf.clear()
    }

    private def pump(): Unit = {
      while (out.isEmpty && rows.hasNext) {
        val b = rows.next()
        if (b.doc_shard != curShard) { runShard(); curShard = b.doc_shard }
        buf.getOrElseUpdate(b.term, mutable.ArrayBuffer.empty) += b
      }
      if (out.isEmpty && !rows.hasNext) runShard()
    }

    override def hasNext: Boolean = { if (out.isEmpty) pump(); out.nonEmpty }
    override def next(): (Int, Long, Double) = {
      if (!hasNext) throw new NoSuchElementException
      out.dequeue()
    }
  }
}
