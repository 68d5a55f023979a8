package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Set operators: union / intersection / subtract / distinct.
  * Reference: RDD.scala:752-821 (union, intersection), :1179-1213
  * (subtract), :534-550 (distinct). The reference rewrites these as
  * cogroups with ignored intermediates; Spark-native they are first-class
  * logical operators Catalyst plans as hash-aggregates / semi joins.
  */
object SetOpQueries {

  val q10UnionDistinct = QueryDef(
    "q10_union_distinct",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy(col("nationkey"))
    },
    Some("""SELECT DISTINCT nationkey FROM (
           |  SELECT c_nationkey AS nationkey FROM customer
           |  UNION ALL SELECT s_nationkey FROM supplier)
           |ORDER BY nationkey""".stripMargin))

  val q11Intersect = QueryDef(
    "q11_intersect",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.intersect(su).orderBy(col("nationkey"))
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
           |INTERSECT SELECT s_nationkey FROM supplier
           |ORDER BY nationkey""".stripMargin))

  val q12Except = QueryDef(
    "q12_except",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"))
      val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
      c.except(o).orderBy(col("custkey"))
    },
    Some("""SELECT c_custkey AS custkey FROM customer
           |EXCEPT SELECT o_custkey FROM orders
           |ORDER BY custkey""".stripMargin))

  val q13Distinct = QueryDef(
    "q13_distinct",
    (s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** EXCEPT ALL — multiset difference (duplicates preserved), the
    * bag-semantics cousin of q12.
    */
  val q48ExceptAll = QueryDef(
    "q48_except_all",
    (s, d) => {
      val l = Tables.lineitem(s, d).select(col("l_suppkey").as("k"))
      val su = Tables.supplier(s, d).select(col("s_suppkey").as("k"))
      l.exceptAll(su)
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },
    Some("""SELECT k, count(*) AS n FROM (
           |  SELECT l_suppkey AS k FROM lineitem
           |  EXCEPT ALL SELECT s_suppkey FROM supplier)
           |GROUP BY k ORDER BY k""".stripMargin))

  /** Sorted array aggregation (collect_list + sort, stringified so both
    * engines compare as text).
    */
  val q49ArrayAgg = QueryDef(
    "q49_array_agg",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(concat_ws(",",
          array_sort(collect_set(col("l_linestatus")))).as("statuses"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
           |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q10UnionDistinct, q11Intersect, q12Except, q13Distinct,
      q48ExceptAll, q49ArrayAgg)
}
