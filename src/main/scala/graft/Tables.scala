package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All queries take a scale-factor directory (e.g. /root/testdata/sf0.01)
  * and read single-parquet tables from it. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning.
  */
object Tables {
  val tpchTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] = tpchTables ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Normalize the `ts` column across the event-table encodings the
    * driver has shipped:
    *  - INT64 TIMESTAMP(NANOS): Spark's reader rejects it
    *    (PARQUET_TYPE_ILLEGAL) unless `nanosAsLong` maps it to LongType;
    *    convert ns→µs with integer `div` — ns-since-epoch (~1.7e18)
    *    exceeds double's 2^53 exact range, so a floating divide would
    *    corrupt timestamps.
    *  - timestamp[us] without timezone: reads as TIMESTAMP_NTZ; cast to
    *    TimestampType (all sessions here run UTC, so values are
    *    unchanged) so downstream windows/joins/encoders see one type.
    */
  def adaptEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless for µs-encoded files; required to load ns-encoded ones
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptEventTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
