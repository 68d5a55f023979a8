package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.Tables
import EventStreams._

/** Streaming correctness: the streaming plans must agree with their
  * batch equivalents on the same (fully delivered) data — the invariant
  * the unified Dataset API promises.
  */
class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def loadEvents(): Seq[Event] = {
    val spark2 = spark
    import spark2.implicits._
    Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().toSeq
  }

  test("streaming hourly windowed agg matches batch aggregation") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    val stream = MemoryStream[Event]
    val q = hourlyCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Complete())
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly")
      .select("hour", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("mapGroupsWithState running counts match batch groupBy across two micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val (first, second) = events.splitAt(events.length / 2)

    val stream = MemoryStream[Event]
    val q = runningUserCounts(stream.toDS())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update())
      .start()
    stream.addData(first)
    q.processAllAvailable()
    stream.addData(second)
    q.processAllAvailable()
    q.stop()

    // the LAST update per user must equal the batch totals
    // counts only grow, so the max-count row per user is the last update
    val finalStates = spark.table("running")
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_value"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        col("s.total_value").as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value")) * 100) / 100).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(finalStates.map(t => (t._1, t._2)) == batch.map(t => (t._1, t._2)))
    assert(finalStates.nonEmpty)
  }

  test("file-source streaming reads the events parquet directly") {
    // FileStreamSource needs an explicit schema; take it from a batch
    // read of the same file so the stream adapts to whichever ts
    // encoding (INT64-nanos or timestamp[us]) the testdata uses, then
    // normalize via the same branch as the batch reader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema =
      spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    // FileStreamSource requires a directory; stage the single parquet
    // file into one (testdata itself is read-only)
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = Tables.adaptEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("file_hourly").agg(sum("n")).head().getLong(0)
    assert(streamed == 1000) // all sf0.001 events counted exactly once
  }

  test("stream-stream interval join matches the same join on batch frames") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    val stream = MemoryStream[Event]
    val q = purchaseClickPairs(stream.toDF())
      .writeStream.format("memory").queryName("pc_pairs")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("pc_pairs")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical code over batch frames is the ground truth
    val batch = purchaseClickPairs(
      Tables.events(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("interval join drops late data past the watermark on both sides") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(minutes: Long) = new Timestamp(base + minutes * 60000L)

    val stream = MemoryStream[Event]
    val q = purchaseClickPairs(stream.toDF())
      .writeStream.format("memory").queryName("pc_late")
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: an in-time pair far ahead — advances the watermark to
    // ~t+992min on both sides
    stream.addData(Seq(
      Event(1L, ts(1000), 1L, "click", 1.0),
      Event(2L, ts(1002), 1L, "purchase", 1.0)))
    q.processAllAvailable()
    // batch 2: a matching pair ~990min BEHIND the watermark — late on
    // both sides; bounded-state semantics require it be dropped
    stream.addData(Seq(
      Event(3L, ts(5), 2L, "click", 1.0),
      Event(4L, ts(8), 2L, "purchase", 1.0)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("pc_late")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((2L, 1L)),
      s"late pair must be dropped, in-time pair kept; got $streamed")
    // the SAME data through the batch path pairs (4,3): the omission
    // above is the watermark dropping late input, not a join-logic gap
    val batch = purchaseClickPairs(Seq(
        Event(1L, ts(1000), 1L, "click", 1.0),
        Event(2L, ts(1002), 1L, "purchase", 1.0),
        Event(3L, ts(5), 2L, "click", 1.0),
        Event(4L, ts(8), 2L, "purchase", 1.0)).toDF())
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((2L, 1L), (4L, 3L)))
  }

  test("streaming dedup suppresses within-watermark duplicates, matches batch distinct") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().take(200)
    // duplicate every 3rd event: half replayed in the same batch (always
    // suppressed — state can't have expired mid-batch), and for the NEXT
    // batch only duplicates whose event time is within the 10-minute
    // watermark delay of the batch-1 max ts — that is exactly the
    // horizon dropDuplicatesWithinWatermark guarantees suppression for;
    // older ids' state is legitimately evicted, so replaying them would
    // make this a data-dependent test of an undefined behavior, not of
    // the operator's contract
    val dups = events.zipWithIndex.collect { case (e, i) if i % 3 == 0 => e }
    val (sameBatch, candidates) = dups.splitAt(dups.length / 2)
    val maxTs = events.map(_.ts.getTime).max
    val delayMs = 10L * 60 * 1000
    val nextBatch = candidates.filter(_.ts.getTime >= maxTs - delayMs)

    val stream = MemoryStream[Event]
    val q = dedupedEvents(stream.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(events ++ sameBatch)
    q.processAllAvailable()
    stream.addData(nextBatch)
    q.processAllAvailable()
    q.stop()

    val streamedIds = spark.table("deduped")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    // every id exactly once, and exactly the batch-distinct id set
    assert(streamedIds.length == streamedIds.distinct.length,
      "a duplicate event_id leaked through the streaming dedup")
    assert(streamedIds.toSet == events.map(_.event_id).toSet)
  }

  test("streaming funnel state machine matches batch q66 exactly") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    def runFunnel(batches: Seq[Seq[Event]], name: String): Set[(Long, Int,
        Option[Timestamp], Option[Timestamp], Option[Timestamp])] = {
      val stream = MemoryStream[Event]
      val q = funnelStages(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.getAs[Timestamp]("t_view")),
        Option(r.getAs[Timestamp]("t_click")),
        Option(r.getAs[Timestamp]("t_purchase")))).toSet
    }

    val batch = graft.operators.EventsQueries.q66EventFunnel
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        Option(r.getAs[Timestamp]("t_view")),
        Option(r.getAs[Timestamp]("t_click")),
        Option(r.getAs[Timestamp]("t_purchase")))).toSet

    // each user's events delivered within ONE micro-batch: the in-batch
    // event-time replay makes the state machine ≡ the batch query —
    // exactly one update row per user, equal to q66 row for row
    val oneShot = runFunnel(Seq(events), "funnel_one")
    assert(oneShot == batch && oneShot.nonEmpty)

    // split by USER across two batches (each user still single-batch):
    // per-user delivery is what matters, not global batch boundaries
    val (even, odd) = events.partition(_.user_id % 2 == 0)
    val split = runFunnel(Seq(even, odd), "funnel_split")
    assert(split == batch)
  }

  test("streaming as-of attribution matches batch q56; clicks carry across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    def runAsOf(batches: Seq[Seq[Event]], name: String): Set[(Long, Long,
        Option[Timestamp], Option[Double])] = {
      val stream = MemoryStream[Event]
      val q = asOfAttribution(stream.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Timestamp]("click_ts")),
        Option(r.getAs[java.lang.Double]("click_value")).map(v =>
          math.round(v * 100) / 100.0))).toSet
    }

    val batch = graft.operators.EventsQueries.q56AsofAttribution
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Timestamp]("click_ts")),
        Option(r.getAs[java.lang.Double]("click_value")).map(_.toDouble)))
      .toSet

    // all events in one batch: event-time replay per user ≡ the batch
    // as-of join, purchase for purchase (incl. never-clicked → None)
    val oneShot = runAsOf(Seq(events), "asof_one")
    assert(oneShot == batch && oneShot.nonEmpty)

    // event-time-ordered two-batch delivery (split at the median ts):
    // purchases in batch 2 whose attributed click arrived in batch 1
    // are served from the O(users) championship state — the unbounded-
    // lookback property the interval join (bounded horizon) cannot
    // provide — and the full ordered replay stays ≡ batch
    val sortedEvs = events.sortBy(_.ts.getTime)
    val (early, late) = sortedEvs.splitAt(sortedEvs.length / 2)
    val asOfSplit = runAsOf(Seq(early, late), "asof_split")
    assert(asOfSplit == batch)
    // the carry is actually exercised: some purchase in the late batch
    // is attributed to a click that could only be in the early batch
    // (click_ts strictly before every late-batch event)
    val lateIds = late.filter(_.event_type == "purchase").map(_.event_id).toSet
    val minLateMs = late.head.ts.getTime
    assert(batch.exists { case (pid, _, clickTs, _) =>
      lateIds.contains(pid) && clickTs.exists(_.getTime < minLateMs)
    }, "split exercised no cross-batch carry")
  }

  test("as-of attribution restarted on its checkpoint carries click state across the restart") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val sortedEvs = events.sortBy(_.ts.getTime)
    val (early, late) = sortedEvs.splitAt(sortedEvs.length / 2)

    val cp = java.nio.file.Files
      .createTempDirectory("graft-asof-cp").toString
    val collected = scala.collection.mutable.Set
      .empty[(Long, Long, Option[Timestamp], Option[Double])]
    def sink(batch: org.apache.spark.sql.Dataset[AsOfPair],
             id: Long): Unit = {
      val rows = batch.collect().map(p => (p.purchase_id, p.user_id,
        p.click_ts, p.click_value.map(v => math.round(v * 100) / 100.0)))
      collected.synchronized { collected ++= rows }
    }
    val stream = MemoryStream[Event]

    // life 1: the early half (clicks that late purchases will need)
    val q1 = asOfAttribution(stream.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .foreachBatch(sink _).start()
    stream.addData(early)
    q1.processAllAvailable()
    q1.stop()

    // the late half arrives while the pipeline is DOWN
    stream.addData(late)

    // life 2: restart on the same checkpoint
    val q2 = asOfAttribution(stream.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .foreachBatch(sink _).start()
    q2.processAllAvailable()
    val inputRows = q2.recentProgress.map(_.numInputRows).sum
    q2.stop()

    // only the uncommitted late half was read after the restart
    // (numInputRows counts SOURCE rows, before the click/purchase
    // filter — so the check is against the raw late-batch size)
    assert(inputRows == late.length,
      s"restart reprocessed committed events: read $inputRows source " +
        s"rows, expected only the ${late.length} uncommitted ones")
    // ...yet the union of both lives equals the batch as-of join —
    // so a late purchase attributed to an early click was served from
    // CHAMPIONSHIP STATE RESTORED ACROSS THE RESTART
    val batch = graft.operators.EventsQueries.q56AsofAttribution
      .fn(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Timestamp]("click_ts")),
        Option(r.getAs[java.lang.Double]("click_value")).map(_.toDouble)))
      .toSet
    assert(collected.toSet == batch,
      s"post-restart attribution diverged from batch q56: " +
        s"onlyStream=${(collected.toSet -- batch).take(3)} " +
        s"onlyBatch=${(batch -- collected.toSet).take(3)}")
    // and the restart seam was actually exercised by a carried click
    val lateIds = late.filter(_.event_type == "purchase").map(_.event_id).toSet
    val minLateMs = late.head.ts.getTime
    assert(batch.exists { case (pid, _, clickTs, _) =>
      lateIds.contains(pid) && clickTs.exists(_.getTime < minLateMs)
    }, "no late purchase needed an early click - the seam went unexercised")
  }

  test("stream-static join enriches events against a batch dimension") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents().take(300)
    val userDim = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("user_total"),
        count(lit(1)).as("user_n"))

    val stream = MemoryStream[Event]
    val q = enrichedEvents(stream.toDF(), userDim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getLong(5))).toSet
    val batch = enrichedEvents(events.toDF(), userDim).collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getLong(5))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // every event present exactly once (left join, no dim fan-out)
    assert(spark.table("enriched").count() == events.length)
  }

  test("streaming session windows produce sessions per user") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()

    val stream = MemoryStream[Event]
    val q = sessionCounts(stream.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete())
      .start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions")
    assert(sessions.count() > 0)
    // exact session-for-session equality with the batch session_window
    // plan on the same fully-delivered data (Complete mode ⇒ final
    // state), not just conservation
    val streamedSessions = sessions
      .select("session_start", "user_id", "n_events").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batchSessions = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamedSessions == batchSessions)
    // per-user event totals conserved (implied, kept as a readable check)
    val totals = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchTotals = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals == batchTotals)
  }

  test("funnel state evicts on event-time timeout; a late event re-opens at stage 0") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String): Event =
      Event(id, Timestamp.valueOf(t), uid, typ, 1.0)

    def run(ttl: Option[String], name: String): Seq[(Long, Int)] = {
      val stream = MemoryStream[Event]
      val q = funnelStages(stream.toDS(), stateTtl = ttl,
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      val batches = Seq(
        // user 1 reaches stage 2 (view -> click)
        Seq(ev(1, "2026-01-01 09:00:00", 1, "view"),
          ev(2, "2026-01-01 09:05:00", 1, "click")),
        // unrelated user advances the watermark far past 09:05 + ttl
        Seq(ev(3, "2026-01-01 12:00:00", 99, "view")),
        // one more batch so the armed timeout actually fires
        Seq(ev(4, "2026-01-01 12:01:00", 99, "view")),
        // user 1's purchase arrives long after eviction
        Seq(ev(5, "2026-01-01 12:30:00", 1, "purchase")))
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      // last update row per user = the machine's final word
      spark.table(name).collect().zipWithIndex
        .map { case (r, i) => (r.getLong(0), r.getInt(1), i) }
        .groupBy(_._1).map { case (u, rows) =>
          val last = rows.maxBy(_._3); (u, last._2)
        }.toSeq.sortBy(_._1)
    }

    // without eviction the old click survives: purchase completes stage 3
    assert(run(None, "funnel_nottl").toMap.apply(1L) == 3)
    // with a 30-minute ttl the state is dropped before the purchase
    // arrives; the purchase alone re-opens the funnel at stage 0
    assert(run(Some("30 minutes"), "funnel_ttl").toMap.apply(1L) == 0)
  }

  test("as-of attribution state evicts on event-time timeout; late purchase unattributed") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, t: String, uid: Long, typ: String, v: Double): Event =
      Event(id, Timestamp.valueOf(t), uid, typ, v)

    def run(ttl: Option[String], name: String)
        : Map[Long, Option[Timestamp]] = {
      val stream = MemoryStream[Event]
      val q = asOfAttribution(stream.toDS(), stateTtl = ttl,
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      val batches = Seq(
        Seq(ev(1, "2026-01-01 09:00:00", 1, "click", 5.0)),
        Seq(ev(2, "2026-01-01 12:00:00", 99, "click", 1.0)),
        Seq(ev(3, "2026-01-01 12:01:00", 99, "click", 1.0)),
        Seq(ev(4, "2026-01-01 12:30:00", 1, "purchase", 9.0)))
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> Option(r.getAs[Timestamp]("click_ts")))
        .toMap
    }

    // unbounded lookback: the 09:00 click attributes the 12:30 purchase
    assert(run(None, "asof_nottl").apply(4L)
      .contains(Timestamp.valueOf("2026-01-01 09:00:00")))
    // 30-minute ttl: the championship click was evicted when the
    // watermark passed 09:30 — the purchase arrives unattributed
    assert(run(Some("30 minutes"), "asof_ttl").apply(4L).isEmpty)
  }
}
