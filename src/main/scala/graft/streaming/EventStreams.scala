package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface. The reference's streaming layer is stock
  * DStreams with no provenance/window additions (SURVEY §1.3/§2.10), so
  * stock Structured Streaming is a strict superset; these transforms are
  * the streaming shapes a training-data pipeline needs — windowed
  * aggregation with watermark, and custom keyed state — defined over any
  * events-shaped input (batch OR stream: the same code plans both ways,
  * which is the point of the unified Dataset API).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** Timestamp ↔ µs-since-epoch. `Timestamp.getTime` is MILLIS — the
    * testdata carries µs precision, so ms-based ordering or state would
    * silently drop the sub-ms component (and batch/stream equality with
    * it).
    */
  private[streaming] def toUs(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
  private[streaming] def toTs(us: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    ts
  }

  final case class UserRunningCount(user_id: Long, n_events: Long,
                                    total_value: Double)

  /** Tumbling 1-hour windowed counts with a 10-minute watermark — late
    * data beyond the watermark is dropped; state is bounded (the property
    * that matters at scale).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Custom keyed state via mapGroupsWithState: running per-user counts.
    * State is one small record per user — O(users) memory with timeout
    * eviction available for unbounded key spaces.
    */
  def runningUserCounts(events: Dataset[Event]): Dataset[UserRunningCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningCount, UserRunningCount](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[UserRunningCount]) =>
          val prev = state.getOption.getOrElse(UserRunningCount(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserRunningCount(uid, n,
            math.round(total * 100).toDouble / 100)
          state.update(next)
          next
      }
  }

  /** Session windows (30-minute gap) per user — the streaming
    * counterpart of q37_sessionize.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup — the streaming counterpart of d01: duplicate
    * event_ids arriving within the watermark interval are suppressed.
    * `dropDuplicatesWithinWatermark` keeps dedup state only until the
    * watermark passes a key's event time, so state is O(events per
    * watermark window) instead of O(everything ever seen) — the form of
    * dedup that survives an unbounded stream. (Plain `dropDuplicates` on
    * a stream would accumulate state forever.)
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Stream-static join: each streaming event enriched against a static
    * dimension frame (here: per-user lifetime stats computed from a
    * batch table). The static side plans as an ordinary broadcast/scan
    * per micro-batch — no streaming state at all, which is why this is
    * the preferred enrichment shape at scale (state-free, and the static
    * side can be a 100 TB-side parquet with pushdown intact).
    */
  def enrichedEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(userDim, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("user_total"), col("user_n"))

  final case class FunnelState(t_view: Option[Timestamp],
                               t_click: Option[Timestamp],
                               t_purchase: Option[Timestamp])
  final case class FunnelUpdate(user_id: Long, stage: Int,
                                t_view: Option[Timestamp],
                                t_click: Option[Timestamp],
                                t_purchase: Option[Timestamp])

  /** Streaming ordered-funnel conversion — the streaming counterpart of
    * q66_event_funnel: per user, the first view, the first click AFTER
    * that view, and the first purchase AFTER that click, with the stage
    * reached (0–3). State is ONE tiny record per user (three optional
    * timestamps) — O(users), the shape that survives an unbounded
    * stream; timeout eviction is available for unbounded key spaces.
    *
    * Each micro-batch's per-user events are replayed in EVENT-TIME
    * order, so when a user's events arrive within one batch the machine
    * reproduces the batch query exactly (spec-proven). Across batches
    * the machine is monotone — stages never regress, and set
    * timestamps never change — which is the watermark-style contract:
    * an event arriving after the stage it would have altered has been
    * passed is treated as late, matching how
    * dropDuplicatesWithinWatermark bounds its own guarantee.
    *
    * `stateTtl` (e.g. `Some("30 minutes")`) arms EVENT-TIME timeout
    * eviction for unbounded key spaces: a user whose last event is
    * older than ttl behind the watermark has their state dropped
    * (bounding memory at O(active users)), and a later event from that
    * user re-opens the funnel at stage 0. Requires a watermark, which
    * is applied here (`watermarkDelay`). Default `None` preserves the
    * O(all users ever seen) unbounded-lookback behavior the q66
    * equivalence spec certifies.
    */
  def funnelStages(events: Dataset[Event],
                   stateTtl: Option[String] = None,
                   watermarkDelay: String = "10 minutes")
      : Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val src =
      if (stateTtl.isDefined) events.withWatermark("ts", watermarkDelay)
      else events
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Update(), timeoutConf) {
        (uid: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // evicted: emit nothing — the user's funnel simply ceases
            // to exist, and any later event starts over at stage 0
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(FunnelState(None, None, None))
            var tv = prev.t_view
            var tc = prev.t_click
            var tp = prev.t_purchase
            val evs = batch.toSeq.sortBy(e => (toUs(e.ts), e.event_id))
            evs.foreach { e =>
              e.event_type match {
                case "view" if tv.forall(e.ts.before) =>
                  tv = Some(e.ts)
                case "click" if tc.isEmpty && tv.exists(e.ts.after) =>
                  tc = Some(e.ts)
                case "purchase" if tp.isEmpty && tc.exists(e.ts.after) =>
                  tp = Some(e.ts)
                case _ => ()
              }
            }
            state.update(FunnelState(tv, tc, tp))
            // timeout clock = this user's newest event + ttl; fires once
            // the WATERMARK (not wall clock) passes it
            stateTtl.foreach(ttl => state.setTimeoutTimestamp(
              evs.map(e => Math.floorDiv(toUs(e.ts), 1000L)).max, ttl))
            val stage = if (tp.isDefined) 3 else if (tc.isDefined) 2
                        else if (tv.isDefined) 1 else 0
            Iterator.single(FunnelUpdate(uid, stage, tv, tc, tp))
          }
      }
  }

  final case class AsOfPair(purchase_id: Long, user_id: Long,
                            click_ts: Option[Timestamp],
                            click_value: Option[Double])

  /** Streaming as-of attribution — the streaming counterpart of
    * q56_asof_attribution: each purchase is attributed to the same
    * user's most recent click at or before it. Unlike the stream-stream
    * interval join (which must buffer BOTH sides within the watermark
    * horizon), the as-of shape needs only the championship state — the
    * single latest click per user — so state is O(users) with unbounded
    * lookback: a purchase can be attributed to a click from hours ago
    * without any buffered click surviving that long.
    *
    * Per micro-batch the user's events replay in event-time order
    * (equal-ts clicks rank before purchases, matching the batch join's
    * `purchase.ts >= click.ts`); with a user's events delivered in one
    * batch this reproduces the batch as-of join exactly (spec-proven),
    * and across batches the carried click state implements the
    * streaming-enrichment semantic: late purchases see every click
    * from earlier batches.
    *
    * `stateTtl` (e.g. `Some("30 minutes")`) arms EVENT-TIME timeout
    * eviction: a user whose championship click is older than ttl
    * behind the watermark has it dropped, so a much-later purchase
    * arrives UNATTRIBUTED (click_ts/click_value null) — the bounded
    * variant of the attribution-window business rule. Requires a
    * watermark, applied here (`watermarkDelay`). Default `None`
    * preserves the unbounded-lookback behavior the q56 equivalence
    * spec certifies.
    */
  def asOfAttribution(events: Dataset[Event],
                      stateTtl: Option[String] = None,
                      watermarkDelay: String = "10 minutes")
      : Dataset[AsOfPair] = {
    import events.sparkSession.implicits._
    val filtered = events
      .filter(col("event_type").isin("click", "purchase"))
      .as[Event]
    val src =
      if (stateTtl.isDefined) filtered.withWatermark("ts", watermarkDelay)
      else filtered
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double, Boolean), AsOfPair](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, batch: Iterator[Event],
         state: GroupState[(Long, Double, Boolean)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // state: (latest click ts µs, its value, defined?)
            var last = state.getOption.filter(_._3)
            val out = Seq.newBuilder[AsOfPair]
            val evs = batch.toSeq
              .sortBy(e => (toUs(e.ts),
                if (e.event_type == "click") 0 else 1, e.event_id))
            evs.foreach {
              case e if e.event_type == "click" =>
                if (last.forall(_._1 <= toUs(e.ts)))
                  last = Some((toUs(e.ts), e.value, true))
              case e =>
                out += AsOfPair(e.event_id, uid,
                  last.map(c => toTs(c._1)), last.map(_._2))
            }
            last.foreach(state.update)
            // setTimeoutTimestamp requires state to exist — a user with
            // only purchases so far holds no state to evict anyway
            if (state.exists)
              stateTtl.foreach(ttl => state.setTimeoutTimestamp(
                evs.map(e => Math.floorDiv(toUs(e.ts), 1000L)).max, ttl))
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join — the streaming counterpart of q57's
    * range join: each purchase joined to the same user's clicks in the
    * preceding 10 minutes. Watermarks on BOTH sides let Spark evict
    * join state once the interval can no longer match (bounded state —
    * the property that matters at scale); the same code joins two batch
    * frames identically, which is what the spec asserts.
    */
  def purchaseClickPairs(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }
}
