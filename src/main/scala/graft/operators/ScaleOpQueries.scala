package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale-technique operators, each gated against an oracle that computes
  * the same answer the straightforward way: the techniques must be
  * result-invariant — they only change the shuffle/partition shape.
  *
  * The reference executes exactly the operator dag the user wrote
  * (SURVEY §4.1, no optimizer); these are the rewrites a 100 TB run
  * needs on top of the same semantics.
  */
object ScaleOpQueries {

  /** Two-phase salted aggregation: `groupBy(key)` on a low-cardinality /
    * skewed key sends every row of a hot key to ONE reducer. Salting
    * splits each key into `numSalts` partial groups (map-side combine
    * still applies within each), then a second tiny aggregation merges
    * the partials — reducer load is bounded by rows/numSalts regardless
    * of skew. Result-identical to the direct groupBy for any
    * commutative-associative aggregate.
    */
  def saltedAgg(df: DataFrame, key: Column, numSalts: Int,
                saltSource: Column)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.groupBy(key.as("__key"), pmod(hash(saltSource), lit(numSalts)).as("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)

  /** events by event_type — 5 distinct values over millions of rows is
    * exactly the shape where unsalted groupBy collapses to 5 reducers.
    */
  val q58SaltedAgg = QueryDef(
    "q58_salted_agg",
    (s, d) => {
      saltedAgg(Tables.events(s, d), col("event_type"), 64, col("event_id"))(
        partial = Seq(count(lit(1)).as("pn"), sum(col("value")).as("psum")),
        merge = Seq(sum(col("pn")).as("n"),
          round(sum(col("psum")), 2).as("sum_value")))
        .withColumnRenamed("__key", "event_type")
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Bloom-filter pre-filtered semi-join: when the probe side is huge and
    * the build side's keys don't fit a broadcast hash set, ship a Bloom
    * filter of the build keys instead and drop non-matching probe rows
    * BEFORE the shuffle — the exact semi-join then runs on the survivors
    * only. False positives are removed by the exact join, so the result
    * is identical; the filter only shrinks the shuffled volume (at 1%
    * fpp, ~10 bits/key — 1 GB of filter covers ~850M keys, far beyond
    * broadcast-hash-join reach).
    */
  val q59BloomSemiJoin = QueryDef(
    "q59_bloom_semi_join",
    (s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bloom = urgent.stat.bloomFilter("o_orderkey", 100000, 0.01)
      val bc = s.sparkContext.broadcast(bloom)
      val mightMatch = udf((k: Long) => bc.value.mightContain(k))
      Tables.lineitem(s, d)
        .filter(mightMatch(col("l_orderkey"))) // pre-shuffle volume cut
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
           |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           |FROM lineitem WHERE l_orderkey IN (
           |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  def all: Seq[QueryDef] = Seq(q58SaltedAgg, q59BloomSemiJoin)
}
