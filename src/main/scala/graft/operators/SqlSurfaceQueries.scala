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

  def all: Seq[QueryDef] = Seq(q44SqlSurface, q45MinPerGroup)
}
