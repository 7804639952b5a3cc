package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.TableIO
import graft.model.CorpusStats

/** Committed-only union views over the base index plus streamed segments.
  *
  * Storage model (the Lucene-segment / LSM shape): the batch build writes an
  * immutable BASE (`doc_lens`, `doc_map`, `term_stats`, `stats`,
  * `postings/group=<g<1000>`), and each streamed micro-batch `b` writes an
  * immutable SEGMENT — `stream_segments/batch=b/{doc_lens,doc_map,
  * term_stats,stats}` + `postings/group=<1000+b>` — with `overwrite`
  * semantics, then commits the `stream_g<b>` manifest step LAST. Nothing is
  * ever appended in place and nothing merged in place, so a replayed batch
  * (crash anywhere before the manifest commit) rewrites byte-identical
  * segment files: ingest is idempotent BY CONSTRUCTION, and the manifest
  * commit is the single visibility point.
  *
  * Readers therefore union base + committed segments (a crashed batch's
  * half-written segment is invisible — its step never committed), and
  * [[graft.streaming.Compactor]] folds committed segments into a fresh base,
  * after which `compact_e<N>` in the manifest retires segments ≤ N from the
  * active set.
  *
  * The additive tables stay exact under this model: N and total_dl sum over
  * segments; df(term) sums over per-segment partial df (doc sets are
  * disjoint — each streamed doc gets a fresh id past the current max).
  */
object IndexTables {

  val SegmentRoot = "stream_segments"
  /** Streamed postings groups are numbered `GroupBase + batchId`; base
    * build groups stay below it. */
  val GroupBase = 1000L

  def segPath(io: TableIO, batch: Long, table: String): String =
    s"${io.tablePath(SegmentRoot)}/batch=$batch/$table"

  /** max(doc_id) over a relation with the empty-relation guard: the
    * aggregate is null on zero rows (a legal empty corpus/batch) and a
    * bare getLong would NPE. Every max_doc_id writer/reader goes through
    * here so the guard cannot be forgotten at a new call site. */
  def maxDocId(df: DataFrame, default: Long): Long = {
    val mx = df.agg(max(col("doc_id"))).head()
    if (mx.isNullAt(0)) default else mx.getLong(0)
  }

  /** Highest epoch folded into the base by a compaction (−1 if never). */
  def lastCompactEpoch(io: TableIO): Long =
    io.committedSteps().collect {
      case s if s.startsWith("compact_e") => s.stripPrefix("compact_e").toLong
    }.maxOption.getOrElse(-1L)

  /** Committed stream batches NOT yet folded into the base — the segments a
    * reader must union in. */
  def activeBatches(io: TableIO): Seq[Long] = {
    val compacted = lastCompactEpoch(io)
    io.committedSteps().collect {
      case s if s.startsWith("stream_g") => s.stripPrefix("stream_g").toLong
    }.filter(_ > compacted).toSeq.sorted
  }

  private def unionView(spark: SparkSession, io: TableIO, table: String,
                        batches: Seq[Long]): DataFrame = {
    val paths = io.tablePath(table) +: batches.map(segPath(io, _, table))
    spark.read.parquet(paths: _*)
  }

  /** (doc_id, dl) over base + active segments. The base has no doc_lens
    * table — the pair is a column-pruned projection of the staged doc_terms
    * (the parquet scan reads two slim columns, never the tfs arrays);
    * segments write the pair directly (their doc_terms are never staged). */
  def docLens(spark: SparkSession, io: TableIO): DataFrame = {
    val base = spark.read.parquet(io.tablePath("doc_terms"))
      .select(col("doc_id"), col("dl"))
    activeBatches(io) match {
      case Seq() => base
      case bs => base.unionByName(
        spark.read.parquet(bs.map(segPath(io, _, "doc_lens")): _*))
    }
  }

  def docMap(spark: SparkSession, io: TableIO): DataFrame =
    unionView(spark, io, "doc_map", activeBatches(io))

  /** Exact df per term over base + active segments (disjoint doc sets ⇒
    * partial dfs add). Base-only indexes return the base table untouched —
    * no aggregate in the no-stream path. */
  def termStats(spark: SparkSession, io: TableIO): DataFrame = {
    val batches = activeBatches(io)
    if (batches.isEmpty) spark.read.parquet(io.tablePath("term_stats"))
    else unionView(spark, io, "term_stats", batches)
      .groupBy("term").agg(sum("df").as("df"))
  }

  /** Merged exact corpus stats: N and total_dl additive over segments,
    * avgdl derived. Segment `stats` rows carry batch-local (n_docs,
    * total_dl); their avgdl field is ignored. */
  def corpusStats(spark: SparkSession, io: TableIO): CorpusStats = {
    import spark.implicits._
    val batches = activeBatches(io)
    if (batches.isEmpty)
      // na.fill: an empty (sub-)index stores null avg/sum aggregates
      spark.read.parquet(io.tablePath("stats"))
        .na.fill(0.0, Seq("avgdl")).na.fill(0L, Seq("total_dl"))
        .as[CorpusStats].head()
    else {
      val r = unionView(spark, io, "stats", batches)
        .agg(sum("n_docs").as("n"), sum("total_dl").as("dl")).head()
      val n = r.getLong(0); val dl = r.getLong(1)
      CorpusStats(n, dl.toDouble / n, dl)
    }
  }

  /** Postings blocks of the base + active segments only: partition-prunes to
    * committed groups, so a crashed batch's half-written group never reaches
    * a reader. */
  def postings(spark: SparkSession, io: TableIO): DataFrame = {
    val active = activeBatches(io).map(GroupBase + _)
    spark.read.parquet(io.tablePath("postings"))
      .where(col("group") < GroupBase || col("group").isin(active: _*))
  }
}
