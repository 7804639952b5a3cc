package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth over the driver's TPC-H-style tables: the aggregate /
  * join / window / sessionize shapes the engine's internal pipelines already
  * exercise (PostingsBuilder's partial aggs, WebIndex's LWW window, the
  * doc_map join), registered as oracle-gated queries in their own right.
  *
  * Cross-engine determinism: money stays in integer cents end-to-end
  * (doubles summed in engine-dependent order drift past micro-rounding at
  * corpus-sized sums; integers cannot), and every ordering includes a
  * unique tiebreak column.
  *
  * Scale notes per query in the Scaladoc below — broadcast only
  * bounded-cardinality dims (nation), never per-row relations. */
object RelQueries {

  private def t(spark: SparkSession, dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  /** TPC-H Q1 shape: scan-heavy partial aggregation. One shuffle of
    * (4-group × partial) rows — map-side combine does all the work; the
    * shipdate filter and 5-column projection push into the parquet scan. */
  def relAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("qty")).as("sum_qty"),
        sum(col("price_c")).as("sum_base_c"),
        sum(col("price_c") * (lit(100L) - col("disc_pct"))).as("sum_disc_c2"),
        count(lit(1)).as("n_rows"))
      // integer floor-division on BOTH sides (a double divide truncated to
      // long can land 1 ulp under the exact quotient)
      .withColumn("avg_qty_x6",
        expr("sum_qty * 1000000L div n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  val relAggSql: String =
    """WITH l AS (SELECT l_returnflag, l_linestatus,
      |  CAST(l_quantity AS BIGINT) AS qty,
      |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |  CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
      |SELECT l_returnflag, l_linestatus,
      |  sum(qty)::BIGINT AS sum_qty,
      |  sum(price_c)::BIGINT AS sum_base_c,
      |  sum(price_c * (100 - disc_pct))::BIGINT AS sum_disc_c2,
      |  count(*)::BIGINT AS n_rows,
      |  CAST(sum(qty)::BIGINT * 1000000 // count(*) AS BIGINT) AS avg_qty_x6
      |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** TPC-H Q5 shape: fact⋈fact shuffle joins + an explicitly broadcast
    * bounded dim (nation — 25 rows at any scale; customer/orders/lineitem
    * shuffle on their keys and AQE may still elect broadcasts from runtime
    * sizes, which is the correct call at bench scale). */
  def relJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("rev_c2"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev_c2").as("revenue_c2"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")

  val relJoinSql: String =
    """SELECT n_name,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_c2,
      |  count(*)::BIGINT AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Top-3 orders per customer: the LWW-window shape (hash-partition by
    * key, per-partition sort, rank filter) — no global sort anywhere; the
    * final orderBy is presentation-only on an already-small result. */
  def relWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        col("rnk"))
      .filter(col("rnk") <= 3)
      .filter(col("o_custkey") % 100 === 0) // deterministic 1% sample of customers
      .select("o_custkey", "rnk", "o_orderkey", "price_c")
      .orderBy("o_custkey", "rnk")
  }

  val relWindowSql: String =
    """WITH r AS (SELECT o_custkey, o_orderkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
      |  row_number() OVER (PARTITION BY o_custkey
      |                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      |  FROM orders)
      |SELECT o_custkey, rnk, o_orderkey, price_c FROM r
      |WHERE rnk <= 3 AND o_custkey % 100 = 0
      |ORDER BY o_custkey, rnk""".stripMargin

  /** TPC-H Q2 shape (min-cost supplier per part within a region), adapted
    * to this schema: the driver tables ship no partsupp, so the supply
    * relation is derived from lineitem — cost(part, supp) = min extended
    * price observed. Scale shape: region⋈nation is a broadcast chain of
    * bounded dims (5 × 25 rows at ANY scale) onto supplier; the
    * corpus-sized work is one partial-agg'd groupBy of lineitem down to
    * (part, supp) and one per-part window (hash partition by part — the
    * LWW shape, no global sort); the part table joins AFTER the rank
    * filter, touching only winners. The `% 20` part sample is applied at
    * the lineitem scan — the window partitions by l_partkey, so the
    * predicate commutes with the rank and cuts ~95% of the groupBy /
    * join / window work instead of filtering after it. */
  def relMinSupp(spark: SparkSession, dir: String): DataFrame = {
    val euro = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .join(broadcast(euro), col("s_nationkey") === col("n_nationkey"))
    val offers = t(spark, dir, "lineitem")
      .filter(col("l_partkey") % 20 === 0)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("price_c")).as("cost_c"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("cost_c").asc, col("s_suppkey").asc)
    offers.join(sup, col("l_suppkey") === col("s_suppkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .join(t(spark, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_type"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("cost_c"))
      .orderBy("p_partkey")
  }

  val relMinSuppSql: String =
    """WITH offers AS (SELECT l_partkey, l_suppkey,
      |  min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
      |  FROM lineitem GROUP BY 1, 2),
      |euro AS (SELECT n_nationkey, n_name FROM nation
      |         JOIN region ON n_regionkey = r_regionkey
      |         WHERE r_name = 'EUROPE'),
      |sup AS (SELECT s_suppkey, s_name, n_name FROM supplier
      |        JOIN euro ON s_nationkey = n_nationkey),
      |r AS (SELECT o.l_partkey, s.s_suppkey, s.s_name, s.n_name, o.cost_c,
      |        row_number() OVER (PARTITION BY o.l_partkey
      |          ORDER BY o.cost_c ASC, s.s_suppkey ASC) AS rnk
      |      FROM offers o JOIN sup s ON o.l_suppkey = s.s_suppkey)
      |SELECT p.p_partkey, p.p_type, r.s_suppkey, r.s_name, r.n_name, r.cost_c
      |FROM r JOIN part p ON r.l_partkey = p.p_partkey
      |WHERE r.rnk = 1 AND p.p_partkey % 20 = 0
      |ORDER BY p.p_partkey""".stripMargin

  /** Sessionize the events stream: per-user lag window → 30-minute-gap
    * session breaks. Same shuffle shape as the LWW window (partition by
    * user, sort by time); at 100 TB this is the canonical
    * repartition+sortWithinPartitions pattern, one shuffle of the events
    * relation. */
  def relSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // exact integer microseconds on both sides (the ts column carries
      // sub-second precision; second-floored casts would disagree on ties).
      // The parquet column is TIMESTAMP_NTZ; the cast reads it as the same
      // wall-clock instant under the pinned UTC session, matching DuckDB's
      // naive epoch_us.
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) >
            1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("new_session").as("n_sessions"))
      .filter(col("user_id") % 50 === 0) // deterministic 2% sample of users
      .orderBy("user_id")
  }

  val relSessionizeSql: String =
    """WITH d AS (SELECT user_id, ts, event_id,
      |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
      |  FROM events)
      |SELECT user_id, count(*)::BIGINT AS n_events,
      |  sum(CASE WHEN prev_ts IS NULL
      |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
      |      THEN 1 ELSE 0 END)::BIGINT AS n_sessions
      |FROM d GROUP BY user_id
      |HAVING user_id % 50 = 0
      |ORDER BY user_id""".stripMargin
}
