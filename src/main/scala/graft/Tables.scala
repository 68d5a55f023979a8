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
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long
    * via the legacy conf, then convert to TimestampType (µs). The
    * conversion uses integer `div` — ns-since-epoch (~1.7e18) exceeds
    * double's 2^53 exact range, so a floating divide would corrupt
    * timestamps.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
