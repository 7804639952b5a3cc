package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Derive dense ids 0..n-1 from a MATERIALIZED `_mid` column (two cheap
    * scans of the same files; no layout dependence). Drops `_mid`. */
  def resolve(staged: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val withP = staged
      .withColumn("_pid", shiftright(col(MidCol), 33).cast("long"))
      .withColumn("_pos", col(MidCol).bitwiseAND(lit(PosMask)))
    val offsets = withP.groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    withP.join(broadcast(offsets), "_pid")
      .withColumn(idCol, col("_offset") + col("_pos"))
      .drop(MidCol, "_pid", "_pos", "_offset")
  }

  /** tag + resolve fused over an in-memory plan — ONLY safe when the input's
    * partition layout cannot be replanned between the two passes (small
    * test inputs). Production index builds must stage `_mid` first. */
  def assign(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    resolve(tag(df), idCol)
}
