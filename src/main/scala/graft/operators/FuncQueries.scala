package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (map-side transforms). The reference has no
  * scalar-function library — users write Scala lambdas inside map()
  * (SURVEY §2.10); Spark-native these are codegen'd Catalyst expressions,
  * which is what keeps them in WholeStageCodegen at scale instead of
  * opaque closures.
  */
object FuncQueries {

  /** String functions: upper / substring / length / concat. */
  val q27StringFuncs = QueryDef(
    "q27_string_funcs",
    (s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          length(col("p_name")).cast("long").as("name_len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
           |  substr(p_name, 1, 10) AS name10,
           |  length(p_name) AS name_len,
           |  concat(p_brand, ':', p_type) AS brand_type
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Date/time functions: year / month / day / date_trunc. */
  val q30DateFuncs = QueryDef(
    "q30_date_funcs",
    (s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           |  day(o_orderdate) AS dom,
           |  date_trunc('month', o_orderdate) AS month_start
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** LIKE + regexp filters; predicates push to the scan. */
  val q40Regex = QueryDef(
    "q40_regex_filter",
    (s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").rlike("(green|blue)"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, p_name FROM part
           |WHERE regexp_matches(p_name, '(green|blue)')
           |ORDER BY p_partkey""".stripMargin))

  /** CASE WHEN classification + conditional agg. */
  val q41CaseWhen = QueryDef(
    "q41_case_when",
    (s, d) => {
      Tables.orders(s, d)
        .select(
          when(col("o_totalprice") >= 300000, "high")
            .when(col("o_totalprice") >= 100000, "mid")
            .otherwise("low").as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("band"))
    },
    Some("""SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
           |            WHEN o_totalprice >= 100000 THEN 'mid'
           |            ELSE 'low' END AS band, count(*) AS n
           |FROM orders GROUP BY 1 ORDER BY band""".stripMargin))

  /** Date arithmetic: day-difference between order and ship dates,
    * aggregated per priority (datediff ≡ date_diff on DATE-cast bounds).
    */
  val q55ShipLatency = QueryDef(
    "q55_ship_latency",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")).as("lag_days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("lag_days")), 4).as("avg_lag_days"),
          max(col("lag_days")).cast("long").as("max_lag_days"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
           |  round(avg(date_diff('day', CAST(o_orderdate AS DATE),
           |                      CAST(l_shipdate AS DATE))), 4) AS avg_lag_days,
           |  max(date_diff('day', CAST(o_orderdate AS DATE),
           |                CAST(l_shipdate AS DATE))) AS max_lag_days
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q27StringFuncs, q30DateFuncs, q40Regex, q41CaseWhen, q55ShipLatency)
}
