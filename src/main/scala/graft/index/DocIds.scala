package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense docID assignment without a global sort (SURVEY §2.7): the
  * two-pass partition-offset trick expressed in pure DataFrame ops.
  *
  * monotonically_increasing_id encodes (partitionId << 33 | position);
  * per-partition counts (a tiny aggregate, partitions ≪ rows) give each
  * partition a cumulative offset, and doc_id = offset + position. One narrow
  * pass + one broadcast join — at 10^12 rows this is the only way to get
  * dense ids without a full-corpus sort (a row_number window over a global
  * order would be exactly that sort).
  *
  * Determinism: ids depend on the input's partition layout. For a committed
  * snapshot this is fixed (same files, same split size); the doc_map table
  * pins url → doc_id at build time, so queries never depend on re-deriving
  * ids. */
object DocIds {

  def assign(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val withMid = df
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("long"))
      .withColumn("_pos", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
    val offsets = withMid.groupBy("_pid")
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset",
        coalesce(sum(col("_cnt")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_offset")
    withMid.join(broadcast(offsets), "_pid")
      .withColumn(idCol, col("_offset") + col("_pos"))
      .drop("_mid", "_pid", "_pos", "_offset")
  }
}
