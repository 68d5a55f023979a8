package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset operators that map the reference's imperative RDD surface:
  * cogroup (CoGroupedRDD.scala:138-169), mapPartitions (RDD.scala:954-1045),
  * glom (RDD.scala:826-831). Kept deterministic so they oracle-check.
  */
object TypedQueries {

  /** KeyValueGroupedDataset.cogroup — the honest Spark mapping of
    * CoGroupedRDD: both sides shuffle on the key, the user function sees
    * both iterators. Oracle: full join of two group-counts.
    */
  val q33Cogroup = QueryDef(
    "q33_cogroup",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val o = Tables.orders(s, d).select(col("o_orderkey")).as[Long]
        .groupByKey(identity)
      val l = Tables.lineitem(s, d).select(col("l_orderkey")).as[Long]
        .groupByKey(identity)
      o.cogroup(l) { (k, os, ls) =>
        Iterator((k, os.size.toLong, ls.size.toLong))
      }.toDF("orderkey", "n_orders", "n_lines")
        .orderBy(col("orderkey"))
    },
    Some("""SELECT coalesce(o.k, l.k) AS orderkey,
           |  coalesce(o.n, 0) AS n_orders, coalesce(l.n, 0) AS n_lines
           |FROM (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1) o
           |FULL JOIN (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1) l
           |  ON o.k = l.k
           |ORDER BY orderkey""".stripMargin))

  /** mapPartitions: per-partition row counting (glom-shaped: the partition
    * is observed as a unit), then a global exact sum — deterministic
    * regardless of partitioning.
    */
  val q34MapPartitions = QueryDef(
    "q34_map_partitions",
    (s, d) => {
      val spark = s
      import spark.implicits._
      Tables.lineitem(s, d).select(col("l_orderkey")).as[Long]
        .mapPartitions(it => Iterator(it.size.toLong))
        .agg(sum(col("value")).as("total_rows"))
    },
    Some("SELECT count(*) AS total_rows FROM lineitem"))

  def all: Seq[QueryDef] = Seq(q33Cogroup, q34MapPartitions)
}
