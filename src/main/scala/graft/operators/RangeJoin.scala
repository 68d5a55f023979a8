package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable equi-key + time-tolerance join: pairs (l, r) with
  * l.key = r.key and |l.t - r.t| ≤ tolerance.
  *
  * Bucketization makes this an equi-join: timestamps are floored into
  * tolerance-width buckets; each LEFT row explodes into its bucket ±1,
  * the right side keeps its single bucket, so every qualifying pair
  * meets in EXACTLY one (key, bucket) cell — an exact |Δt| filter after
  * the hash join finishes the predicate, and no dedup is needed. Cost is
  * 3× the left row count into one hash shuffle, versus a nested-loop /
  * broadcast range join whose intermediate is O(|key cells|²) — at
  * 100 TB the bucketed form partitions and AQE-skew-splits like any
  * equi-join.
  */
object RangeJoin {

  /** @param left      probe side; its columns survive unprefixed
    * @param right     build side; pre-rename its columns so only `key`
    *                  collides with left's
    * @param key       equality key column name (both sides)
    * @param ltCol     left timestamp column name
    * @param rtCol     right timestamp column name
    * @param tolMicros half-window in microseconds
    */
  def withinTolerance(left: DataFrame, right: DataFrame, key: String,
                      ltCol: String, rtCol: String,
                      tolMicros: Long): DataFrame = {
    def bucket(c: Column): Column = floor(unix_micros(c) / lit(tolMicros))
    val l2 = left.withColumn("_b",
      explode(array(bucket(col(ltCol)) - 1, bucket(col(ltCol)),
        bucket(col(ltCol)) + 1)))
    val r2 = right.withColumn("_b", bucket(col(rtCol)))
    l2.join(r2, Seq(key, "_b"))
      .filter(abs(unix_micros(col(ltCol)) - unix_micros(col(rtCol))) <= tolMicros)
      .drop("_b")
  }
}
