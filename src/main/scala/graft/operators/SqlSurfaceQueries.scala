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

  /** TPC-H Q11 shape: groups whose value exceeds a fraction of the
    * global total — HAVING against a scalar subquery.
    */
  val q51ValueFraction = QueryDef(
    "q51_value_fraction",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val l = Tables.lineitem(s, d)
      val total = l.agg(sum(col("l_extendedprice")).as("t"))
      l.groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice")).as("supp_value"))
        .join(broadcast(total))
        // round both membership sides: raw double comparisons can flip
        // boundary rows when partition order changes the summation ULPs
        .filter(round(col("supp_value"), 2) > round(col("t") * 0.012, 6))
        .select(col("l_suppkey"), round(col("supp_value"), 2).as("supp_value"))
        .orderBy(col("l_suppkey"))
    },
    Some("""SELECT l_suppkey, round(sum(l_extendedprice), 2) AS supp_value
           |FROM lineitem GROUP BY l_suppkey
           |HAVING round(sum(l_extendedprice), 2) >
           |  round((SELECT sum(l_extendedprice) FROM lineitem) * 0.012, 6)
           |ORDER BY l_suppkey""".stripMargin))

  /** TPC-H Q22 shape: above-average-balance customers with no orders,
    * rolled up by a name-prefix "country code" — scalar subquery +
    * anti join + substring grouping in one query.
    */
  val q52LostCustomers = QueryDef(
    "q52_lost_customers",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > round(col("ab"), 6))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(substring(col("c_name"), 1, 10).as("name_prefix"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("name_prefix"))
    },
    Some("""SELECT substr(c_name, 1, 10) AS name_prefix, count(*) AS n_cust,
           |  round(sum(c_acctbal), 2) AS total_bal
           |FROM customer
           |WHERE c_acctbal > round((SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0), 6)
           |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           |GROUP BY 1 ORDER BY name_prefix""".stripMargin))

  /** TPC-H Q21 shape ("suppliers who kept orders waiting"): the hardest
    * correlated pattern in TPC-H — EXISTS(other supplier on the order)
    * AND NOT EXISTS(other supplier ALSO late). The Spark plan decorrelates
    * both subqueries into aggregates ("exactly one distinct late supplier"
    * ∧ "≥2 distinct suppliers"), so the whole query is three shuffles on
    * l_orderkey and no per-row probing; the oracle keeps the literal
    * EXISTS/NOT EXISTS formulation — two independent derivations.
    * "Late" = shipped >60 days after the order date.
    */
  val q60SoleLateSupplier = QueryDef(
    "q60_sole_late_supplier",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val late = l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > date_add(col("o_orderdate"), 60))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val soleLateOrders = late.groupBy(col("ok"))
        .agg(count(lit(1)).as("n_late_supp"))
        .filter(col("n_late_supp") === 1)
        .select(col("ok"))
      val multiSuppOrders = l
        .groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("ns"))
        .filter(col("ns") >= 2)
        .select(col("ok"))
      late.join(soleLateOrders, Seq("ok"))
        .join(multiSuppOrders, Seq("ok"))
        .groupBy(col("sk").as("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },
    Some("""SELECT l1.l_suppkey AS s_suppkey,
           |  count(DISTINCT l1.l_orderkey) AS numwait
           |FROM lineitem l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
           |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (
           |    SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM lineitem l3
           |    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin))

  /** Relational division: customers who ordered in EVERY priority class.
    * Spark decorrelates to a count-distinct equality against the global
    * distinct count (two aggregates + a broadcast of one row — no nested
    * probing); the oracle is the textbook double-NOT-EXISTS division.
    */
  val q61PriorityDivision = QueryDef(
    "q61_priority_division",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val o = Tables.orders(s, d)
      val total = o.select(
        countDistinct(col("o_orderpriority")).as("tot"))
      o.groupBy(col("o_custkey"))
        .agg(countDistinct(col("o_orderpriority")).as("np"))
        .join(broadcast(total), col("np") === col("tot"))
        .select(col("o_custkey"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT DISTINCT c.o_custkey FROM orders c
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) ps
           |  WHERE NOT EXISTS (
           |    SELECT 1 FROM orders o2
           |    WHERE o2.o_custkey = c.o_custkey AND o2.o_orderpriority = ps.p))
           |ORDER BY o_custkey""".stripMargin))

  /** TPC-H Q22 shape ("global sales opportunity"): customers whose
    * balance beats the average positive balance but who have gone
    * dormant (no order since 2000) — a scalar subquery plus an
    * anti-join, grouped by market segment. Spark's plan computes the
    * scalar average once (one row, broadcast into the filter), then a
    * LEFT ANTI join against the pre-filtered recent-orders keys — no
    * per-customer probing; the oracle keeps the literal scalar-subquery
    * + NOT EXISTS formulation. Balances are 2dp values so sum() lands
    * on the 0.01 grid — round(2) can't sit on a rounding boundary.
    */
  val q62ColdCustomers = QueryDef(
    "q62_cold_customers",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val c = Tables.customer(s, d)
      val recent = Tables.orders(s, d)
        .filter(expr("o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"))
        .select(col("o_custkey"))
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("ab"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS numcust,
           |  round(sum(c_acctbal), 2) AS totacctbal
           |FROM customer c
           |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
           |                   WHERE c_acctbal > 0)
           |  AND NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey
           |                    AND o.o_orderdate >= DATE '2000-01-01')
           |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** TPC-H Q18 shape ("large volume customers"): orders whose total
    * quantity exceeds 250, joined back to customer and re-aggregated,
    * top-10 by volume. The IN-subquery decorrelates to a self-aggregate
    * + semi-join in Spark (the qualifying-orders set is tiny and
    * broadcast); quantities are integral doubles so the sums are exact
    * in any summation order — no rounding protocol needed.
    */
  val q63LargeVolumeCustomers = QueryDef(
    "q63_large_volume_customers",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val l = Tables.lineitem(s, d)
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("tq"))
        .filter(col("tq") > 250)
        .select(col("l_orderkey"))
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .join(l.join(big, "l_orderkey"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT c_name, o_orderkey, sum(l_quantity) AS total_qty
           |FROM customer, orders, lineitem
           |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
           |                     GROUP BY l_orderkey
           |                     HAVING sum(l_quantity) > 250)
           |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
           |GROUP BY c_name, o_orderkey
           |ORDER BY total_qty DESC, o_orderkey LIMIT 10""".stripMargin))

  /** TPC-H Q20 shape ("potential part promotion"): nested IN-subqueries
    * with a CORRELATED aggregate threshold — suppliers who shipped more
    * than 30% of a small part's total recent volume. (The testdata has
    * no partsupp table, so the availqty comparison becomes a
    * shipped-volume dominance test over part→lineitem — the identical
    * decorrelation pattern: IN(part filter) nested inside IN(grouped
    * lineitem HAVING sum > correlated scalar subquery).) The Spark plan
    * decorrelates by hand the way Catalyst decorrelates Q20: one
    * filtered scan grouped twice — per (supplier, part) and per part —
    * joined on the part key, then a semi-join into supplier; no per-group
    * probing. The oracle keeps the literal nested form. Quantities are
    * integral doubles, so both engines compute 0.3·total from the same
    * exact integer-valued sum — the comparison is engine-stable with no
    * rounding protocol.
    */
  val q64DominantSuppliers = QueryDef(
    "q64_dominant_suppliers",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val smallParts = Tables.part(s, d)
        .filter(col("p_size") <= 10).select(col("p_partkey"))
      val recent = Tables.lineitem(s, d)
        .filter(expr("l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val perSuppPart = recent.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("sq"))
      val perPart = recent.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity")).as("part_total"))
      val dominant = perSuppPart.join(perPart, Seq("l_partkey"))
        .filter(col("sq") > col("part_total") * 0.3)
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name
           |FROM supplier
           |WHERE s_suppkey IN (
           |  SELECT l_suppkey FROM lineitem l1
           |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
           |    AND l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
           |  GROUP BY l_suppkey, l_partkey
           |  HAVING sum(l_quantity) > (
           |    SELECT 0.3 * sum(l2.l_quantity) FROM lineitem l2
           |    WHERE l2.l_partkey = l1.l_partkey
           |      AND l2.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'))
           |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q7 shape ("volume shipping"): bidirectional nation-pair
    * revenue by ship year — a five-table join where BOTH endpoint
    * dimensions filter (supplier's nation and customer's nation, in
    * either direction). The Spark plan broadcasts the two tiny filtered
    * nation sides into the supplier/customer dims and lets the two fact
    * joins (lineitem⋈orders) shuffle on their keys; the disjunctive
    * nation-pair predicate is applied after both dims resolve —
    * Catalyst pushes each branch's equality down its own side. Revenue
    * uses the engine-shared round(sum(price·(1−disc)), 2) protocol of
    * q03/q05.
    */
  val q65NationVolume = QueryDef(
    "q65_nation_volume",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
        .filter(col("supp_nation").isin("NATION_18", "NATION_19"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
        .filter(col("cust_nation").isin("NATION_18", "NATION_19"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  year(l_shipdate) AS l_year,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE n1.n_name IN ('NATION_18', 'NATION_19')
           |  AND n2.n_name IN ('NATION_18', 'NATION_19')
           |  AND n1.n_name <> n2.n_name
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** Q21's multi-correlated pattern fed to Catalyst AS WRITTEN: unlike
    * q60 — the same shape decorrelated BY HAND into aggregates — q69
    * hands Spark the literal EXISTS / NOT EXISTS text and relies on
    * RewritePredicateSubquery to plan the two correlated subqueries as
    * a left-semi and a left-anti join on l_orderkey (no per-row
    * probing; both rewrites ride hash joins at scale). The oracle runs
    * the identical literal SQL in DuckDB, so the gate pins Catalyst's
    * decorrelation against an independent engine's. "Waiting" here =
    * a RETURNED line (l_returnflag 'R') on a finished ('F') order:
    * suppliers who were the SOLE returned supplier on a multi-supplier
    * order — Q21's quantifier nesting over different predicates than
    * q60's late-shipment reading.
    */
  val q69SoleReturnedSupplier = QueryDef(
    "q69_sole_returned_supplier",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q69_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("q69_orders")
      s.sql("""
        SELECT l1.l_suppkey AS s_suppkey,
               count(DISTINCT l1.l_orderkey) AS numwait
        FROM q69_lineitem l1
        JOIN q69_orders o ON l1.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
            SELECT 1 FROM q69_lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM q69_lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY l1.l_suppkey
        ORDER BY numwait DESC, s_suppkey
        LIMIT 20""")
    },
    Some("""SELECT l1.l_suppkey AS s_suppkey,
           |  count(DISTINCT l1.l_orderkey) AS numwait
           |FROM lineitem l1
           |JOIN orders o ON l1.l_orderkey = o.o_orderkey
           |WHERE o.o_orderstatus = 'F'
           |  AND l1.l_returnflag = 'R'
           |  AND EXISTS (
           |    SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM lineitem l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_returnflag = 'R')
           |GROUP BY l1.l_suppkey
           |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin))

  /** TPC-H Q17 shape ("small-quantity-order revenue"): a CORRELATED
    * SCALAR aggregate subquery on the same fact table — each lineitem
    * compares its quantity against 0.2·avg(quantity) of ITS OWN part.
    * Like q69, the literal correlated text goes to Catalyst as written;
    * its scalar-subquery decorrelation (DecorrelateInnerQuery) plans the
    * per-part average as one grouped aggregate joined back on
    * l_partkey — no per-row probing — and the oracle runs the identical
    * literal SQL in DuckDB, pinning the rewrite against an independent
    * engine. This closes the last classic decorrelation shape: q31
    * covers the uncorrelated scalar, q64 Q20's nested-IN threshold, q69
    * Q21's multi-EXISTS. The threshold compare is engine-stable: avg =
    * exact integral sum / exact count, one IEEE division on both sides;
    * the output rides the e06 float-cast rounding protocol.
    */
  val q70SmallQtyRevenue = QueryDef(
    "q70_small_qty_revenue",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q70_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q70_part")
      s.sql("""
        SELECT round(cast(sum(l1.l_extendedprice) / 7.0 AS FLOAT), 2)
                 AS avg_yearly
        FROM q70_lineitem l1
        JOIN q70_part ON p_partkey = l1.l_partkey
        WHERE p_size <= 5
          AND l1.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity)
            FROM q70_lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)""")
    },
    Some("""SELECT round(cast(sum(l1.l_extendedprice) / 7.0 AS FLOAT), 2)
           |         AS avg_yearly
           |FROM lineitem l1
           |JOIN part ON p_partkey = l1.l_partkey
           |WHERE p_size <= 5
           |  AND l1.l_quantity < (
           |    SELECT 0.2 * avg(l2.l_quantity)
           |    FROM lineitem l2
           |    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin))

  /** TPC-H Q15 shape: a derived revenue view aggregated from lineitem,
    * then the supplier(s) whose revenue equals the view's MAX — a scalar
    * subquery over the SAME derived view it filters, fed to Catalyst as
    * written. The planner must evaluate the view's aggregate once more
    * for the max (or reuse it via exchange reuse) and join supplier on
    * the equality — never per-row re-aggregation. Sums are FLOAT-cast
    * before rounding on both engines (e06 protocol) because the
    * max-equality compares summation-order-sensitive doubles.
    * Reference scope: SQL is beyond the reference's RDD surface
    * (SURVEY §2.10) — these shapes gate the Catalyst path the library
    * rests on.
    */
  val q71TopRevenueSupplier = QueryDef(
    "q71_top_revenue_supplier",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q71_lineitem")
      Tables.supplier(s, d).createOrReplaceTempView("q71_supplier")
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT), 2)
                   AS total_revenue
          FROM q71_lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM q71_supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |         round(cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT), 2)
           |           AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= DATE '1996-01-01'
           |    AND l_shipdate < DATE '1996-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM supplier
           |JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q8 shape: national market share — a six-table snowflake join
    * (lineitem→orders→customer→nation→region plus supplier→nation a
    * SECOND time, so `nation` joins twice under different roles) with a
    * conditional aggregate ratio per year. The two dimension chains are
    * broadcast-sized; the only shuffles the big tables see are the
    * lineitem⋈orders join and the final per-year aggregate. Ratio of two
    * summation-order-sensitive sums → FLOAT-cast before rounding (e06
    * protocol) on both engines.
    */
  val q72MarketShare = QueryDef(
    "q72_market_share",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q72_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("q72_orders")
      Tables.customer(s, d).createOrReplaceTempView("q72_customer")
      Tables.supplier(s, d).createOrReplaceTempView("q72_supplier")
      Tables.nation(s, d).createOrReplaceTempView("q72_nation")
      Tables.region(s, d).createOrReplaceTempView("q72_region")
      s.sql("""
        SELECT year(o_orderdate) AS o_year,
               round(cast(sum(CASE WHEN n2.n_name = 'NATION_2'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END) AS FLOAT)
                     / cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT),
                     4) AS mkt_share
        FROM q72_lineitem
        JOIN q72_orders   ON l_orderkey = o_orderkey
        JOIN q72_customer ON o_custkey = c_custkey
        JOIN q72_nation n1 ON c_nationkey = n1.n_nationkey
        JOIN q72_region   ON n1.n_regionkey = r_regionkey
        JOIN q72_supplier ON l_suppkey = s_suppkey
        JOIN q72_nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY year(o_orderdate)
        ORDER BY o_year""")
    },
    Some("""SELECT cast(year(o_orderdate) AS INT) AS o_year,
           |  round(cast(sum(CASE WHEN n2.n_name = 'NATION_2'
           |                      THEN l_extendedprice * (1 - l_discount)
           |                      ELSE 0 END) AS FLOAT)
           |        / cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT),
           |        4) AS mkt_share
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON c_nationkey = n1.n_nationkey
           |JOIN region   ON n1.n_regionkey = r_regionkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |WHERE r_name = 'ASIA'
           |GROUP BY year(o_orderdate)
           |ORDER BY o_year""".stripMargin))

  /** TPC-H Q19 shape ("discounted revenue"): one join under a
    * DISJUNCTION of conjunctive clauses, each mixing predicates from
    * both sides (part brand/size AND lineitem quantity). The planner
    * must extract the common `p_partkey = l_partkey` equi-key from
    * under the OR (join condition stays hash-joinable, broadcast on
    * part), push the part-only disjuncts down to the part scan, and
    * leave only the cross-side residual on the join — the classic
    * OR-predicate factoring test. Sum-of-products output rides the e06
    * FLOAT-cast rounding protocol.
    */
  val q73DisjunctiveRevenue = QueryDef(
    "q73_disjunctive_revenue",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q73_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q73_part")
      s.sql("""
        SELECT round(cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT), 2)
                 AS revenue
        FROM q73_lineitem JOIN q73_part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)""")
    },
    Some("""SELECT round(cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT), 2)
           |         AS revenue
           |FROM lineitem JOIN part ON p_partkey = l_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** TPC-H Q2 shape, LITERAL form ("minimum-cost supplier"): the
    * correlated scalar MIN subquery REPEATS the outer query's
    * supplier→nation→region join chain inside itself, with lineitem
    * standing in for partsupp (price = l_extendedprice per (part,
    * supplier) offer). q45 gates the decorrelated min-join rewrite a
    * user would hand-write; this feeds Catalyst the correlated text
    * TPC-H actually ships, so DecorrelateInnerQuery must hoist the
    * whole joined subquery into a per-part aggregate and join it back —
    * with the region filter applied independently on both copies of the
    * dimension chain (both broadcast-sized). Price equality compares
    * raw stored doubles (no arithmetic), so it is exact cross-engine;
    * DISTINCT collapses repeated offers at the same minimum; ordering
    * on the full output row makes LIMIT 100 deterministic.
    */
  val q74MinCostSupplier = QueryDef(
    "q74_min_cost_supplier",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q74_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q74_part")
      Tables.supplier(s, d).createOrReplaceTempView("q74_supplier")
      Tables.nation(s, d).createOrReplaceTempView("q74_nation")
      Tables.region(s, d).createOrReplaceTempView("q74_region")
      s.sql("""
        SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
               l.l_extendedprice AS min_price
        FROM q74_part p
        JOIN q74_lineitem l ON l.l_partkey = p.p_partkey
        JOIN q74_supplier s ON s.s_suppkey = l.l_suppkey
        JOIN q74_nation n ON n.n_nationkey = s.s_nationkey
        JOIN q74_region r ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size BETWEEN 10 AND 20
          AND r.r_name = 'ASIA'
          AND l.l_extendedprice = (
            SELECT min(l2.l_extendedprice)
            FROM q74_lineitem l2
            JOIN q74_supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN q74_nation n2 ON n2.n_nationkey = s2.s_nationkey
            JOIN q74_region r2 ON r2.r_regionkey = n2.n_regionkey
            WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_price
        LIMIT 100""")
    },
    Some("""SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           |       l.l_extendedprice AS min_price
           |FROM part p
           |JOIN lineitem l ON l.l_partkey = p.p_partkey
           |JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |JOIN nation n ON n.n_nationkey = s.s_nationkey
           |JOIN region r ON r.r_regionkey = n.n_regionkey
           |WHERE p.p_size BETWEEN 10 AND 20
           |  AND r.r_name = 'ASIA'
           |  AND l.l_extendedprice = (
           |    SELECT min(l2.l_extendedprice)
           |    FROM lineitem l2
           |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
           |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
           |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
           |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')
           |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_price
           |LIMIT 100""".stripMargin))

  /** TPC-H Q14 shape ("promotion effect"): ratio of a conditional
    * aggregate to the total over one date-pruned fact⋈dimension join —
    * the date range prunes the lineitem scan (PushedFilters), part
    * broadcasts, and both sums ride the SAME single aggregate (one scan,
    * no re-read for the denominator). Ratio of two summation-order-
    * sensitive sums → both FLOAT-cast before the division, and the
    * ratio itself DOUBLE-cast before rounding: Spark's type coercion
    * divides floats in double while DuckDB divides FLOAT/FLOAT in
    * float, and a ratio sitting on a 4dp float boundary (this one
    * does) would otherwise round apart.
    */
  val q75PromoRevenue = QueryDef(
    "q75_promo_revenue",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q75_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q75_part")
      s.sql("""
        SELECT round(cast(cast(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS FLOAT)
                 / cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT)
                 AS DOUBLE), 4)
                 AS promo_revenue
        FROM q75_lineitem JOIN q75_part ON l_partkey = p_partkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate < DATE '1996-03-01'""")
    },
    Some("""SELECT round(cast(cast(100.0 * sum(CASE WHEN p_type = 'PROMO'
           |               THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS FLOAT)
           |         / cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT)
           |         AS DOUBLE), 4)
           |         AS promo_revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= DATE '1996-01-01'
           |  AND l_shipdate < DATE '1996-03-01'""".stripMargin))

  /** TPC-H Q16 shape ("parts/supplier relationship"): NOT IN over a
    * subquery — the one subquery membership form the surface did not
    * yet gate (q64 covers nested IN, q46/q69 EXISTS/NOT EXISTS).
    * `l_suppkey NOT IN (...)` plans as a null-aware anti join; with the
    * count(DISTINCT) over a three-column grouping on top, the whole
    * query is the anti join plus two shuffles (distinct expand, final
    * agg). The excluded-supplier list is broadcast-sized by
    * construction (a filtered dimension).
    */
  val q76SupplierCount = QueryDef(
    "q76_supplier_count",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q76_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q76_part")
      Tables.supplier(s, d).createOrReplaceTempView("q76_supplier")
      s.sql("""
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM q76_part JOIN q76_lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM q76_supplier WHERE s_acctbal < 1000)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    },
    Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM part JOIN lineitem ON p_partkey = l_partkey
           |WHERE p_brand <> 'Brand#1'
           |  AND p_size IN (1, 5, 10, 15, 20, 25)
           |  AND l_suppkey NOT IN (
           |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q5 shape ("local supplier volume"): the five-way
    * fact⋈customer⋈supplier⋈nation⋈region star join with the extra
    * NON-key equi-condition c_nationkey = s_nationkey — customer and
    * supplier must sit in the SAME nation, which no single join key
    * provides; Catalyst carries it as a second equi-predicate on the
    * supplier join. nation and region broadcast; the one shuffle
    * exchange keys on o_custkey/l_orderkey between the two fact-side
    * joins. Revenue ranks the output (rank on the ROUNDED value,
    * n_name tie-break).
    */
  val q77LocalSupplierVolume = QueryDef(
    "q77_local_supplier_volume",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= DATE '1996-01-01'
           |  AND o_orderdate < DATE '1997-01-01'
           |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  /** TPC-H Q6 shape ("forecast revenue change"): the pure-pushdown
    * query — zero joins, one global aggregate, every predicate
    * (date range, discount band, quantity cap) eligible for parquet
    * PushedFilters, so at 100 TB the scan itself is the whole plan and
    * row-group statistics prune most of it. Discount bounds compare
    * stored doubles against the same literals in both engines (the
    * generator's 0.01-step grid makes BETWEEN 0.05 AND 0.07 exact).
    */
  val q78ForecastRevenue = QueryDef(
    "q78_forecast_revenue",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    },
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= DATE '1996-01-01'
           |  AND l_shipdate < DATE '1997-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin))

  /** TPC-H Q9 shape ("product type profit"): profit per supplier
    * nation per year over a part-name substring filter. The schema has
    * no partsupp/ps_supplycost (TESTDATA.md), so cost is modeled as
    * 0.6 × p_retailprice × l_quantity — preserving Q9's defining
    * shape: a DIFFERENCE of two product aggregates (revenue minus
    * cost) grouped by nation × year under a LIKE '%...%' filter that
    * cannot prune the part scan (substring match ⇒ full dimension
    * read, still broadcast-sized). The profit sum subtracts
    * near-cancelling terms, so ordering noise is absorbed by the
    * FLOAT-cast-before-round protocol (e06).
    */
  val q79ProductProfit = QueryDef(
    "q79_product_profit",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q79_lineitem")
      Tables.part(s, d).createOrReplaceTempView("q79_part")
      Tables.supplier(s, d).createOrReplaceTempView("q79_supplier")
      Tables.nation(s, d).createOrReplaceTempView("q79_nation")
      s.sql("""
        SELECT n_name AS nation, cast(year(l_shipdate) AS INT) AS o_year,
               round(cast(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity) AS FLOAT), 2)
                 AS profit
        FROM q79_lineitem
        JOIN q79_part ON p_partkey = l_partkey
        JOIN q79_supplier ON s_suppkey = l_suppkey
        JOIN q79_nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, year(l_shipdate)
        ORDER BY nation, o_year DESC""")
    },
    Some("""SELECT n_name AS nation, cast(year(l_shipdate) AS INT) AS o_year,
           |       round(cast(sum(l_extendedprice * (1 - l_discount)
           |                     - 0.6 * p_retailprice * l_quantity) AS FLOAT), 2)
           |         AS profit
           |FROM lineitem
           |JOIN part ON p_partkey = l_partkey
           |JOIN supplier ON s_suppkey = l_suppkey
           |JOIN nation ON n_nationkey = s_nationkey
           |WHERE p_name LIKE '%widget%'
           |GROUP BY n_name, year(l_shipdate)
           |ORDER BY nation, o_year DESC""".stripMargin))

  /** TPC-H Q10 shape ("returned item reporting"): top-20 customers by
    * revenue lost to returns in one quarter — fact⋈orders⋈customer
    * with broadcast nation, group by the full customer row, rank on
    * the ROUNDED revenue with c_custkey as the deterministic
    * tie-break, LIMIT 20 (TakeOrderedAndProject: each partition keeps
    * only its local top-20, no global sort at scale). One customer's
    * true revenue sits exactly on a 2dp rounding boundary, so the sum
    * is FLOAT-cast before rounding on both sides (e06 protocol).
    */
  val q80ReturnedItems = QueryDef(
    "q80_returned_items",
    (s, d) => {
      import org.apache.spark.sql.functions._
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("float"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
           |  round(cast(sum(l_extendedprice * (1 - l_discount)) AS FLOAT), 2) AS revenue
           |FROM customer
           |JOIN orders ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= DATE '1996-01-01'
           |  AND o_orderdate < DATE '1996-04-01'
           |GROUP BY c_custkey, c_name, n_name
           |ORDER BY revenue DESC, c_custkey
           |LIMIT 20""".stripMargin))

  /** TPC-H Q12 shape ("shipping modes and order priority"): the
    * conditional-count pivot — one fact⋈orders join, a CASE bucket as
    * the grouping key, and two CASE-sums splitting lines by order
    * priority. The schema has no l_shipmode/l_receiptdate
    * (TESTDATA.md), so the bucket is derived ship SPEED
    * (shipdate − orderdate lag bands), preserving Q12's plan: join,
    * derive, one map-side-combined aggregate over 3 groups. Counts
    * cast BIGINT (DuckDB CASE-sum returns HUGEINT).
    */
  val q81ShipSpeedPriority = QueryDef(
    "q81_ship_speed_priority",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("q81_lineitem")
      Tables.orders(s, d).createOrReplaceTempView("q81_orders")
      s.sql("""
        SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'LATE'
                    WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
                    ELSE 'FAST' END AS ship_speed,
               cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM q81_lineitem JOIN q81_orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")
    },
    Some("""SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'LATE'
           |            WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
           |            ELSE 'FAST' END AS ship_speed,
           |       cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |       cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q44SqlSurface, q45MinPerGroup, q46OrderPriority, q47BandJoin,
      q51ValueFraction, q52LostCustomers, q60SoleLateSupplier,
      q61PriorityDivision, q62ColdCustomers, q63LargeVolumeCustomers,
      q64DominantSuppliers, q65NationVolume, q69SoleReturnedSupplier,
      q70SmallQtyRevenue, q71TopRevenueSupplier, q72MarketShare,
      q73DisjunctiveRevenue, q74MinCostSupplier, q75PromoRevenue,
      q76SupplierCount, q77LocalSupplierVolume, q78ForecastRevenue,
      q79ProductProfit, q80ReturnedItems, q81ShipSpeedPriority)
}
