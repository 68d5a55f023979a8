package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable left as-of join: for each left row, the right row with the
  * greatest time ≤ the left row's time, per key.
  *
  * Implementation is the union-tag + carry-forward window, not a range
  * join: tag both sides, union, ONE shuffle on the key, per-key
  * time-ordered window carrying the latest right payload forward, then
  * keep left rows. Cost is one Exchange + one sort regardless of how
  * many right rows precede each left row — a range-join formulation
  * (l.key = r.key AND r.t <= l.t with a max-per-group on top) explodes
  * to O(matches) intermediate pairs, which at 100 TB is the difference
  * between a join that finishes and one that doesn't. Right rows sort
  * before left rows at equal timestamps, so "at or exactly at" matches
  * count (same tie rule as DuckDB/engine ASOF semantics).
  */
object AsOfJoin {

  /** @param left    probe side; all its columns survive
    * @param right   reference side
    * @param key     equality key column name (both sides)
    * @param time    event-time column name (both sides)
    * @param carried right columns to carry onto matches
    * @param prefix  output prefix: carried column c → s"$prefix$c", plus
    *                s"${prefix}$time" = matched right row's time; all
    *                NULL when no right row precedes the left row
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
               carried: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payload = struct((time +: carried).map(col): _*)
    // SQL equality never matches NULL = NULL: right rows with a NULL key
    // (or NULL time — unordered) can match nothing and are dropped, so a
    // NULL-key left row gets NULL outputs instead of adopting other
    // NULL-key right rows as matches (they would otherwise share one
    // window partition).
    val r2 = right.filter(col(key).isNotNull && col(time).isNotNull)
      .select(col(key), col(time), payload.as("_carry"),
        lit(null).cast(structTypeOf(left)).as("_left"), lit(0).as("_side"))
    val l2 = left.select(col(key), col(time),
      lit(null).cast(payloadTypeOf(right, time, carried)).as("_carry"),
      struct(left.columns.map(col): _*).as("_left"), lit(1).as("_side"))
    // `_carry` as the final sort key makes ties deterministic: among
    // right rows equal on (time), last() picks the greatest payload —
    // run-to-run stable where plain (time, _side) ordering would hand
    // last() whichever tied row the sort emitted later.
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_side").asc, col("_carry").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      left.columns.map(c => col(s"_left.$c").as(c)).toSeq ++
        (time +: carried).map(c => col(s"_last.$c").as(s"$prefix$c"))
    l2.unionByName(r2)
      .withColumn("_last", last(col("_carry"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(outCols: _*)
  }

  private def structTypeOf(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  private def payloadTypeOf(df: DataFrame, time: String, carried: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      (time +: carried).map(c => df.schema(c)))
}
