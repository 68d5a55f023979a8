package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Window-function surface. The reference's RDD layer has none (SURVEY
  * §2.10) — stock Spark `Window` is a strict superset; these queries pin
  * the semantics against DuckDB. zipWithIndex is the one reference op
  * (ZippedWithIndexRDD.scala:66) that maps to a window/RDD hybrid.
  */
object WindowQueries {

  /** rank / dense_rank / row_number, top-3 per partition.
    * Deterministic tiebreak on c_custkey.
    */
  val q17WindowRank = QueryDef(
    "q17_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
                col("rn"), col("rk"))
        .orderBy(col("c_nationkey"), col("rn"))
    },
    Some("""SELECT c_nationkey, c_custkey, c_acctbal, rn, rk FROM (
           |  SELECT c_nationkey, c_custkey, c_acctbal,
           |    row_number() OVER w AS rn, rank() OVER w AS rk
           |  FROM customer
           |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
           |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin))

  /** Running (cumulative) sum per customer in order-date order.
    * Frame order is pinned identically in both engines so the float
    * accumulation sequence matches; o_totalprice is a true 2-decimal
    * value so round(..,2) sits mid-interval, never on a boundary.
    */
  val q18WindowRunning = QueryDef(
    "q18_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderdate, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** lag / lead across an event sequence per user. */
  val q19WindowLagLead = QueryDef(
    "q19_window_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
                col("prev_type"), col("next_type"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, event_type,
           |  lag(event_type, 1) OVER w AS prev_type,
           |  lead(event_type, 1) OVER w AS next_type
           |FROM events
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |ORDER BY event_id""".stripMargin))

  /** zipWithIndex parity (ZippedWithIndexRDD.scala:66): deterministic
    * global index via RDD zipWithIndex over a sorted dataset — scales
    * without the single-partition window a naive row_number() needs
    * (zipWithIndex is one count job + per-partition offsets).
    */
  val q25ZipWithIndex = QueryDef(
    "q25_zip_with_index",
    (s, d) => {
      val spark = s
      import spark.implicits._
      Tables.customer(s, d)
        .select(col("c_custkey")).orderBy(col("c_custkey")).as[Long]
        .rdd.zipWithIndex()
        .map { case (k, i) => (i, k) }
        .toDF("idx", "c_custkey")
        .orderBy(col("idx"))
    },
    Some("""SELECT row_number() OVER (ORDER BY c_custkey) - 1 AS idx, c_custkey
           |FROM customer ORDER BY idx""".stripMargin))

  /** Top-3 suppliers per nation by acctbal via the CUSTOM TopKPerKey
    * operator (graft.plans: LogicalPlan + Strategy + two-phase bounded-
    * heap SparkPlan — no sort, O(keys·k) memory). Oracle is the window
    * formulation, proving the custom physical operator computes the
    * same relation.
    */
  val q42TopKPerKeyCustom = QueryDef(
    "q42_topk_per_key_custom",
    (s, d) => {
      val su = Tables.supplier(s, d)
      graft.plans.TopK.perKey(su, Seq("s_nationkey"),
          struct(negate(col("s_acctbal")), col("s_suppkey")), k = 3)
        .select(col("s_nationkey"), col("s_suppkey"),
          round(col("s_acctbal"), 2).as("s_acctbal"))
        .orderBy(col("s_nationkey"), col("s_suppkey"))
    },
    Some("""SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS s_acctbal
           |FROM (
           |  SELECT s_nationkey, s_suppkey, s_acctbal,
           |    row_number() OVER (PARTITION BY s_nationkey
           |      ORDER BY s_acctbal DESC, s_suppkey) AS rn
           |  FROM supplier)
           |WHERE rn <= 3 ORDER BY s_nationkey, s_suppkey""".stripMargin))

  /** RANGE window frame: per customer, sum of order totals whose
    * o_orderkey lies within 5 of the current row's key — value-based
    * framing (vs q18's ROWS framing).
    */
  val q53RangeFrame = QueryDef(
    "q53_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .rangeBetween(-5, 0)
      Tables.orders(s, d)
        .withColumn("nearby_total", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("nearby_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           |    ORDER BY o_orderkey
           |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS nearby_total
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** first_value / last_value / nth_value analytics over a full-partition
    * frame.
    */
  val q54FirstLast = QueryDef(
    "q54_first_last",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.customer(s, d)
        .withColumn("richest", first(col("c_custkey")).over(w))
        .withColumn("poorest", last(col("c_custkey")).over(w))
        .withColumn("second", nth_value(col("c_custkey"), 2).over(w))
        .select(col("c_nationkey"), col("c_custkey"),
          col("richest"), col("poorest"), col("second"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""SELECT c_nationkey, c_custkey,
           |  first_value(c_custkey) OVER w AS richest,
           |  last_value(c_custkey) OVER w AS poorest,
           |  nth_value(c_custkey, 2) OVER w AS second
           |FROM customer
           |WINDOW w AS (PARTITION BY c_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY c_nationkey, c_custkey""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q17WindowRank, q18WindowRunning, q19WindowLagLead, q25ZipWithIndex,
      q42TopKPerKeyCustom, q53RangeFrame, q54FirstLast)
}
