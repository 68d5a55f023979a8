package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation surface: combineByKey-family, global aggregates, stats,
  * histogram, grouping sets, pivot, percentiles.
  * Reference: PairRDDFunctions.scala:85-522 (combineByKey/reduceByKey/
  * aggregateByKey/foldByKey/groupByKey/countByKey), RDD.scala:1219-1486
  * (reduce/fold/aggregate/count/countApproxDistinct),
  * DoubleRDDFunctions.scala:44-133 (stats/histogram).
  * All are groupBy().agg in Spark — Catalyst emits partial (map-side)
  * aggregation automatically, which is the scale-critical property the
  * reference got from its combiner machinery.
  */
object AggQueries {

  /** count(distinct) — exact. Reference: countApproxDistinct is the
    * approximate cousin (RDD.scala:1460-1486); the exact path is a
    * two-phase expand+agg in Catalyst.
    */
  val q22CountDistinct = QueryDef(
    "q22_count_distinct",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
           |  count(DISTINCT l_partkey) AS n_part
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** stats() family: count/mean/stdev/variance/min/max/sum.
    * Reference: DoubleRDDFunctions.scala:44 (StatCounter).
    */
  val q23Stats = QueryDef(
    "q23_stats",
    (s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("c_acctbal")), 4).as("avg_bal"),
          round(stddev_samp(col("c_acctbal")), 2).as("stddev_bal"),
          round(var_samp(col("c_acctbal")), 2).as("var_bal"),
          round(min(col("c_acctbal")), 2).as("min_bal"),
          round(max(col("c_acctbal")), 2).as("max_bal"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, count(*) AS n,
           |  round(avg(c_acctbal), 4) AS avg_bal,
           |  round(stddev_samp(c_acctbal), 2) AS stddev_bal,
           |  round(var_samp(c_acctbal), 2) AS var_bal,
           |  round(min(c_acctbal), 2) AS min_bal,
           |  round(max(c_acctbal), 2) AS max_bal,
           |  round(sum(c_acctbal), 2) AS sum_bal
           |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** Fixed-width histogram. Reference: DoubleRDDFunctions.histogram
    * (:100-133) — here a single groupBy on the bucket expression, which
    * scales as one map-side-combined shuffle.
    */
  val q24Histogram = QueryDef(
    "q24_histogram",
    (s, d) => {
      Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT cast(floor(o_totalprice / 50000) AS BIGINT) AS bucket, count(*) AS n
           |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** CUBE grouping sets (free in Spark SQL; absent in the reference's RDD
    * layer — SURVEY §2.6 notes stock Spark provides it).
    */
  val q20Cube = QueryDef(
    "q20_cube",
    (s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy(col("rf"), col("ls"))
    },
    Some("""SELECT coalesce(l_returnflag, '<all>') AS rf,
           |  coalesce(l_linestatus, '<all>') AS ls,
           |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY rf, ls""".stripMargin))

  /** ROLLUP over the region→nation hierarchy. */
  val q21Rollup = QueryDef(
    "q21_rollup",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .select(
          coalesce(col("r_name"), lit("<all>")).as("region"),
          coalesce(col("n_name"), lit("<all>")).as("nation"),
          col("n_cust"))
        .orderBy(col("region"), col("nation"))
    },
    Some("""SELECT coalesce(r_name, '<all>') AS region,
           |  coalesce(n_name, '<all>') AS nation, count(*) AS n_cust
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (r_name, n_name)
           |ORDER BY region, nation""".stripMargin))

  /** Pivot (conditional aggregation). Spark's pivot IS groupBy+filtered
    * aggs under the hood; oracle spells that out with FILTER clauses.
    */
  val q32Pivot = QueryDef(
    "q32_pivot",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum(col("l_quantity")), 2))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
           |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS "A",
           |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2) AS "N",
           |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2) AS "R"
           |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  /** Global aggregate (reduce/fold/aggregate/max/min parity,
    * RDD.scala:1219-1348,1656-1664) — single-row result, partial agg
    * means no full shuffle at scale.
    */
  val q35GlobalAgg = QueryDef(
    "q35_global_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT round(sum(l_quantity), 2) AS sum_qty,
           |  round(min(l_extendedprice), 2) AS min_price,
           |  round(max(l_extendedprice), 2) AS max_price,
           |  count(*) AS n
           |FROM lineitem""".stripMargin))

  /** treeAggregate over an exact integer domain (cents) — demonstrates the
    * RDD tree-reduction path (RDD.scala:1236-1248,1336) with a
    * deterministic (associative-exact) combine.
    */
  val q36TreeAggregate = QueryDef(
    "q36_tree_aggregate",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val cents = Tables.lineitem(s, d)
        .select(round(col("l_quantity") * 100).cast("long").as("c"))
        .as[Long]
      val total = cents.rdd.treeAggregate(0L)(_ + _, _ + _, depth = 2)
      Seq(total).toDF("qty_cents")
    },
    Some("SELECT cast(sum(cast(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents FROM lineitem"))

  /** Explicit GROUPING SETS through the SQL text surface — the one §2.6
    * multi-grouping shape not covered by q20 (cube) / q21 (rollup): an
    * arbitrary, non-hierarchical set list. Catalyst plans one Expand +
    * one aggregation exactly as for cube/rollup. ORDER BY pins NULLS
    * FIRST because DuckDB defaults to NULLS LAST on ASC.
    */
  val q38GroupingSets = QueryDef(
    "q38_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  round(sum(l_quantity), 2) AS sum_qty,
              |  count(*) AS n_rows
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |                        (l_linestatus), ())
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin)
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  count(*) AS n_rows
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           |                        (l_linestatus), ())
           |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin))

  /** Exact interpolated percentiles. Reference has none (approx HLL only);
    * stock Spark `percentile` ≡ DuckDB `quantile_cont`.
    */
  val q39Percentiles = QueryDef(
    "q39_percentiles",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Scalar subquery comparison (orders above global mean). */
  val q31ScalarSubquery = QueryDef(
    "q31_scalar_subquery",
    (s, d) => {
      val o = Tables.orders(s, d)
      val avgPrice = o.agg(avg(col("o_totalprice")).as("a"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > round(col("a"), 6))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_totalprice > round((SELECT avg(o_totalprice) FROM orders), 6)
           |ORDER BY o_orderkey""".stripMargin))

  /** TPC-H Q13 shape: distribution of orders-per-customer — two stacked
    * aggregations (left join → per-customer count → count-of-counts).
    * The second groupBy input is already tiny; at scale only the first
    * shuffle moves real data.
    */
  val q43CustDist = QueryDef(
    "q43_custdist",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_orders"))
    },
    Some("""SELECT n_orders, count(*) AS n_cust FROM (
           |  SELECT c_custkey, count(o_orderkey) AS n_orders
           |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
           |  GROUP BY c_custkey)
           |GROUP BY n_orders ORDER BY n_orders""".stripMargin))

  /** GROUP BY ... HAVING — post-aggregation filter. */
  val q50Having = QueryDef(
    "q50_having",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
          count(lit(1)).as("n_items"))
        .filter(col("total_qty") > 2000)
        .orderBy(col("l_suppkey"))
    },
    Some("""SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty,
           |  count(*) AS n_items
           |FROM lineitem GROUP BY l_suppkey
           |HAVING round(sum(l_quantity), 2) > 2000
           |ORDER BY l_suppkey""".stripMargin))

  def all: Seq[QueryDef] = Seq(
    q20Cube, q21Rollup, q22CountDistinct, q23Stats, q24Histogram,
    q31ScalarSubquery, q32Pivot, q35GlobalAgg, q36TreeAggregate,
    q38GroupingSets, q39Percentiles, q43CustDist, q50Having)
}
