package graft.operators

import graft.Tables

/** The SQL text surface: the same ANSI SQL runs through spark.sql(...)
  * and the DuckDB oracle verbatim — proof that a reference user can
  * bring plain SQL, not just the DataFrame API.
  */
object SqlSurfaceQueries {

  /** Dialect-neutral SQL executed identically by both engines. */
  private val q44Sql =
    """SELECT n_name,
      |  count(*) AS n_cust,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > 0
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val q44SqlSurface = QueryDef(
    "q44_sql_surface",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(q44Sql)
    },
    Some(q44Sql))

  /** Greatest-n-per-group via decorrelated min-join (TPC-H Q2 shape):
    * per nation, the supplier(s) holding the minimum acctbal.
    */
  val q45MinPerGroup = QueryDef(
    "q45_min_per_group",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val su = Tables.supplier(s, d)
      val mins = su.groupBy(col("s_nationkey").as("mk"))
        .agg(min(col("s_acctbal")).as("m"))
      su.join(broadcast(mins),
          col("s_nationkey") === col("mk") && col("s_acctbal") === col("m"))
        .select(col("s_nationkey"), col("s_suppkey"),
          round(col("s_acctbal"), 2).as("min_bal"))
        .orderBy(col("s_nationkey"), col("s_suppkey"))
    },
    Some("""SELECT s.s_nationkey, s.s_suppkey, round(s.s_acctbal, 2) AS min_bal
           |FROM supplier s
           |JOIN (SELECT s_nationkey AS mk, min(s_acctbal) AS m
           |      FROM supplier GROUP BY 1) t
           |  ON s.s_nationkey = t.mk AND s.s_acctbal = t.m
           |ORDER BY s.s_nationkey, s.s_suppkey""".stripMargin))

  /** TPC-H Q4 shape: correlated EXISTS with an extra predicate —
    * Catalyst plans a left-semi join with mixed equi/non-equi condition.
    */
  val q46OrderPriority = QueryDef(
    "q46_order_priority",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders
           |FROM orders
           |WHERE EXISTS (
           |  SELECT 1 FROM lineitem
           |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Non-equi (range/band) join: orders classified into price bands via
    * an inequality join against a tiny broadcast band table.
    */
  val q47BandJoin = QueryDef(
    "q47_band_join",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val spark = s
      import spark.implicits._
      val bands = Seq(
        ("p0_100k", 0.0, 100000.0),
        ("p100k_200k", 100000.0, 200000.0),
        ("p200k_300k", 200000.0, 300000.0),
        ("p300k_plus", 300000.0, 1e12))
        .toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("band"))
    },
    Some("""WITH bands(band, lo, hi) AS (VALUES
           |  ('p0_100k', 0.0, 100000.0),
           |  ('p100k_200k', 100000.0, 200000.0),
           |  ('p200k_300k', 200000.0, 300000.0),
           |  ('p300k_plus', 300000.0, 1e12))
           |SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
           |FROM orders JOIN bands
           |  ON o_totalprice >= lo AND o_totalprice < hi
           |GROUP BY band ORDER BY band""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q44SqlSurface, q45MinPerGroup, q46OrderPriority, q47BandJoin)
}
