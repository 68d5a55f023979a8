package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.io.api.RecordConsumer
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Schema-drift guard for the events table.
  *
  * The driver has shipped `events.parquet` in two encodings across
  * testdata regenerations: INT64 annotated TIMESTAMP(NANOS) (readable
  * only as LongType under `nanosAsLong`), and plain `timestamp[us]`
  * without timezone (reads as TIMESTAMP_NTZ). Round 6 ended red because
  * the loader assumed the first; this spec writes a tiny fixture in
  * BOTH encodings and asserts `Tables.events` loads them to identical
  * rows with a single canonical ts type, so the next regeneration
  * cannot silently take the events query family out again.
  */
class EventsEncodingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("events-encoding-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // three instants at µs precision, including a non-integral second
  private val micros =
    Seq(1700000000000000L, 1700000001500000L, 1700003600000007L)

  /** Minimal raw-parquet writer for the legacy encoding: INT64 with
    * TIMESTAMP(NANOS) annotation, which Spark's vectorized reader
    * refuses unless `nanosAsLong` maps it to LongType. Spark itself
    * cannot write this, hence parquet-mr directly (same approach as
    * prov/MetaParquet).
    */
  private def writeNanosFixture(file: String,
                                rows: Seq[(Long, Long)]): Unit = {
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveType.PrimitiveTypeName.INT64)
        .named("event_id"))
      .addField(Types.required(PrimitiveType.PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("spark_schema")
    final class Support extends WriteSupport[(Long, Long)] {
      private var rc: RecordConsumer = _
      override def init(conf: Configuration): WriteSupport.WriteContext =
        new WriteSupport.WriteContext(
          schema, java.util.Collections.emptyMap[String, String]())
      override def prepareForWrite(r: RecordConsumer): Unit = rc = r
      override def write(row: (Long, Long)): Unit = {
        rc.startMessage()
        rc.startField("event_id", 0); rc.addLong(row._1); rc.endField("event_id", 0)
        rc.startField("ts", 1); rc.addLong(row._2); rc.endField("ts", 1)
        rc.endMessage()
      }
    }
    final class B(out: HadoopOutputFile)
        extends ParquetWriter.Builder[(Long, Long), B](out) {
      override def self(): B = this
      override def getWriteSupport(conf: Configuration): WriteSupport[(Long, Long)] =
        new Support
    }
    val conf = new Configuration()
    val w = new B(HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), conf)).withConf(conf).build()
    try rows.foreach(w.write) finally w.close()
  }

  test("Tables.events loads µs-timestamp and INT64-nanos fixtures identically") {
    // encoding A — current testdata: timestamp[us], no timezone
    // (TIMESTAMP_NTZ), written by Spark's own writer
    val ntzDir = Files.createTempDirectory("events-ntz").toString
    val spark2 = spark
    import spark2.implicits._
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")

    // encoding B — legacy testdata: INT64 + TIMESTAMP(NANOS) metadata
    val nanosDir = Files.createTempDirectory("events-nanos").toString
    writeNanosFixture(s"$nanosDir/events.parquet",
      micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) })

    val a = Tables.events(spark, ntzDir)
    val b = Tables.events(spark, nanosDir)
    assert(a.schema("ts").dataType == TimestampType,
      s"µs fixture must load ts as TimestampType, got ${a.schema("ts").dataType}")
    assert(b.schema("ts").dataType == TimestampType,
      s"nanos fixture must load ts as TimestampType, got ${b.schema("ts").dataType}")

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(rows(a) == expected, "µs fixture rows drifted")
    assert(rows(b) == expected, "nanos fixture rows drifted")
  }

  test("real testdata events load with canonical ts type and full row count") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 1000)
  }
}
