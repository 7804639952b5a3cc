package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense docID assignment without a global sort (SURVEY §2.7): the
  * two-pass partition-offset trick expressed in pure DataFrame ops.
  *
  * monotonically_increasing_id encodes (partitionId << 33 | position).
  * Per-partition counts (a tiny aggregate, partitions ≪ rows) give each
  * partition a cumulative offset, and doc_id = offset + position.
  *
  * CORRECTNESS AT SCALE — tag-then-resolve protocol: the offset aggregate
  * and the id-projection are two passes, and if both run over an
  * UN-materialized plan, AQE may lay out the upstream shuffle differently
  * in each subtree (coalescing decisions vary with stage statistics), so
  * `_pid` diverges between passes and ids collide. (Observed at 480k docs /
  * 8 cores; invisible at smaller scale.) Production paths therefore
  * [[DocIds.tag]] rows during their one materializing write and
  * [[DocIds.resolve]] ids from the PERSISTED `_mid` column — a pure
  * function of file contents: deterministic, resume-stable, and safe under
  * any recomputation or AQE replanning. */
object DocIds {

  val MidCol = "_mid"
  private val PosMask = (1L << 33) - 1

  /** Tag rows with the raw monotonic id — call INSIDE the single
    * materializing write of a staged table. */
  def tag(df: DataFrame): DataFrame =
    df.withColumn(MidCol, monotonically_increasing_id())

  /** Cumulative offset per writer-partition id, from the MATERIALIZED
    * `_mid` column: one tiny aggregate (rows = #write partitions), driver
    * cumsum. Callers that read a staged table several times compute this
    * ONCE and reuse it via [[resolveWith]]. */
  def offsets(staged: DataFrame): Map[Long, Long] = {
    val counts = staged
      .groupBy(shiftright(col(MidCol), 33).cast("long").as("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    counts.map { case (pid, cnt) => val o = (pid, acc); acc += cnt; o }.toMap
  }

  /** Pure projection: doc_id = offsets(_mid >> 33) + (_mid & mask). No
    * joins, no extra jobs — the offsets map is partition-count-sized, and
    * the lookup is an O(1) index into an array LITERAL (offsets laid out
    * dense over 0..maxPid; writer-partition ids are small ints), so the id
    * projection stays inside whole-stage codegen — a Scala UDF here would
    * break codegen for the whole downstream projection. */
  def resolveWith(staged: DataFrame, offs: Map[Long, Long],
                  idCol: String = "doc_id"): DataFrame = {
    val maxPid = if (offs.isEmpty) 0L else offs.keys.max
    require(maxPid < 1000000, s"writer partition id $maxPid too large for a literal offset table")
    // gaps (writer partitions that produced zero rows) never occur in the
    // data, so their slots can hold anything; 0 keeps the literal simple
    val dense: IndexedSeq[Column] =
      (0L to maxPid).map(pid => lit(offs.getOrElse(pid, 0L)))
    staged
      .withColumn(idCol,
        element_at(array(dense: _*),
          (shiftright(col(MidCol), 33) + lit(1)).cast("int")) +
          col(MidCol).bitwiseAND(lit(PosMask)))
      .drop(MidCol)
  }

  /** Derive dense ids 0..n-1 from a MATERIALIZED `_mid` column (one tiny
    * offsets aggregate + a pure projection; no layout dependence). */
  def resolve(staged: DataFrame, idCol: String = "doc_id"): DataFrame =
    resolveWith(staged, offsets(staged), idCol)

  /** tag + resolve fused over an in-memory plan — ONLY safe when the input's
    * partition layout cannot be replanned between the two passes (small
    * test inputs). Production index builds must stage `_mid` first. */
  def assign(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    resolve(tag(df), idCol)
}
