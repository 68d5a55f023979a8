package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics over the `events` table, batch-mode. The same
  * logical queries run under Structured Streaming (see
  * graft.streaming.EventStreams + its spec); the reference's streaming
  * layer adds nothing beyond stock DStreams (SURVEY §1.3), so stock
  * Structured Streaming is a superset.
  */
object EventsQueries {

  /** countByValue parity (RDD.scala:1415-1426). */
  val q26CountByValue = QueryDef(
    "q26_count_by_value",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n FROM events
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Tumbling 1-hour window aggregation — the batch shape of a streaming
    * windowed agg. Uses Spark's window() operator; oracle uses
    * date_trunc which is equivalent for tumbling windows aligned to the
    * hour.
    */
  val q28EventsHourly = QueryDef(
    "q28_events_hourly",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    },
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
           |  count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin))

  /** Sessionization: 30-minute-gap session windows per user, then session
    * counts. Spark session_window ≡ gaps-and-islands SQL (a new session
    * starts when the gap since the previous event is >= the gap duration,
    * since Spark's session interval is [ts, ts+gap) ).
    */
  val q37Sessionize = QueryDef(
    "q37_sessionize",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(*) AS n_sessions,
           |  cast(sum(cnt) AS BIGINT) AS n_events FROM (
           |  SELECT user_id, count(*) AS cnt FROM (
           |    SELECT user_id, ts,
           |      sum(CASE WHEN prev_ts IS NULL
           |               OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
           |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
           |    FROM (SELECT user_id, event_id, ts,
           |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           |          FROM events))
           |  GROUP BY user_id, session_id)
           |GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** JSON extraction from the props column.
    * get_json_object ≡ DuckDB json_extract_string.
    */
  val q29JsonExtract = QueryDef(
    "q29_json_extract",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, cast(json_extract_string(props, '$.k') AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  /** As-of join (click attribution): for each purchase, the user's most
    * recent click at or before the purchase — AsOfJoin's union-tag +
    * carry-forward window, one shuffle, no range-pair explosion. The
    * oracle is DuckDB's native ASOF JOIN, so the operator's semantics
    * (greatest click_ts ≤ purchase ts, per user, NULL when none) are
    * checked against an independent engine implementation.
    */
  val q56AsofAttribution = QueryDef(
    "q56_asof_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      AsOfJoin.leftAsOf(purchases, clicks, "user_id", "ts",
          carried = Seq("value"), prefix = "click_")
        .select(col("event_id"), col("user_id"),
          col("click_ts"), round(col("click_value"), 2).as("click_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id, c.ts AS click_ts,
           |  round(c.value, 2) AS click_value
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           |  ON p.user_id = c.user_id AND p.ts >= c.ts
           |ORDER BY p.event_id""".stripMargin))

  /** Interval/range join (error proximity): per purchase, how many
    * errors the same user hit within ±10 minutes — RangeJoin's bucketed
    * equi-join (pairs meet exactly once, exact |Δt| filter after the
    * hash join), then a left join back so zero-error purchases keep
    * n_errors = 0. Oracle is a plain SQL inequality join.
    */
  val q57RangeErrorProximity = QueryDef(
    "q57_range_error_proximity",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"))
      val counts = RangeJoin
        .withinTolerance(purchases, errors, "user_id", "ts", "err_ts",
          tolMicros = 10L * 60 * 1000000)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_errors"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_errors"), lit(0L)).as("n_errors"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id, count(e.ts) AS n_errors
           |FROM (SELECT event_id, user_id, ts FROM events
           |      WHERE event_type = 'purchase') p
           |LEFT JOIN (SELECT user_id, ts FROM events
           |           WHERE event_type = 'error') e
           |  ON p.user_id = e.user_id
           | AND e.ts >= p.ts - INTERVAL 10 MINUTE
           | AND e.ts <= p.ts + INTERVAL 10 MINUTE
           |GROUP BY p.event_id, p.user_id
           |ORDER BY p.event_id""".stripMargin))

  /** Ordered funnel conversion (view → click-after-view →
    * purchase-after-click), the product-analytics staple: each stage's
    * timestamp must strictly follow the previous stage's FIRST
    * occurrence for that user. Emits one row per user with the stage
    * reached (0–3) and the per-stage timestamps.
    *
    * Scale shape — ONE shuffle total: the three stage minima are
    * chained whole-partition window aggregates over the same user_id
    * partitioning (each stage's condition references the previous
    * stage's windowed column), so Catalyst plans a single Exchange
    * feeding three consecutive Window operators, then the per-user
    * rollup reuses that partitioning with no further movement. The
    * round-4 formulation ran the funnel as three aggregations with
    * stage-to-stage joins — ~6 shuffle/sort legs; at 100× events
    * (10M rows) ScaleBench read it at 28–39 s, the window form at
    * ~3 s, and the join form's per-row throughput DEGRADED from x10 to
    * x100 while the window form's improves — joins were the wrong
    * shape for a per-user sequential dependency.
    */
  val q66EventFunnel = QueryDef(
    "q66_event_funnel",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
            col("ts") > col("t_view"), col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t_click"), col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(first(col("t_view")).as("t_view"),
          first(col("t_click")).as("t_click"),
          first(col("t_purchase")).as("t_purchase"))
        .select(col("user_id"),
          (when(col("t_purchase").isNotNull, 3)
            .when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1)
            .otherwise(0)).cast("int").as("stage"),
          col("t_view"), col("t_click"), col("t_purchase"))
        .orderBy(col("user_id"))
    },
    Some("""WITH users AS (SELECT DISTINCT user_id FROM events),
           |v AS (
           |  SELECT user_id, min(ts) AS t_view FROM events
           |  WHERE event_type = 'view' GROUP BY 1),
           |c AS (
           |  SELECT e.user_id, min(e.ts) AS t_click
           |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
           |  WHERE e.event_type = 'click' GROUP BY 1),
           |p AS (
           |  SELECT e.user_id, min(e.ts) AS t_purchase
           |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
           |  WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT u.user_id,
           |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
           |       WHEN c.t_click IS NOT NULL THEN 2
           |       WHEN v.t_view IS NOT NULL THEN 1
           |       ELSE 0 END AS INT) AS stage,
           |  v.t_view, c.t_click, p.t_purchase
           |FROM users u
           |LEFT JOIN v ON u.user_id = v.user_id
           |LEFT JOIN c ON u.user_id = c.user_id
           |LEFT JOIN p ON u.user_id = p.user_id
           |ORDER BY u.user_id""".stripMargin))

  /** Latest/earliest event per user via `max_by`/`min_by` (DuckDB
    * `arg_max`/`arg_min`) — the CDC keep-newest-version pattern done as
    * ONE map-side-combinable aggregation instead of the window-rank
    * formulation (which must sort every user's events; max_by keeps a
    * single running champion per group — the shape that wins at 100 TB).
    * (user_id, ts) pairs are unique in the data, so the champions are
    * deterministic.
    */
  val q67LatestPerUser = QueryDef(
    "q67_latest_per_user",
    (s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          max(col("ts")).as("last_ts"),
          max_by(col("event_type"), col("ts")).as("last_type"),
          round(max_by(col("value"), col("ts")), 4).as("last_value"),
          min(col("ts")).as("first_ts"),
          min_by(col("event_type"), col("ts")).as("first_type"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
           |  max(ts) AS last_ts,
           |  arg_max(event_type, ts) AS last_type,
           |  round(arg_max("value", ts), 4) AS last_value,
           |  min(ts) AS first_ts,
           |  arg_min(event_type, ts) AS first_type,
           |  count(*) AS n_events
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Hourly gap-filled rollup: the q28 hourly aggregate joined against
    * a GENERATED (event_type × hour) spine covering the corpus's full
    * time range, so empty hours appear as explicit zero rows — the
    * resample/densify step every downstream time-series consumer
    * (charting, anomaly detection, rate-limiting) needs. Scale shape:
    * the spine derives from a two-column broadcast (global min/max hour
    * + distinct types, both tiny aggregates) and `sequence()` explodes
    * it executor-side — the spine is never driver-materialized; the
    * left join is spine-side small (hours × types) against the hourly
    * aggregate, both keyed identically.
    */
  val q68HourlyGapfill = QueryDef(
    "q68_hourly_gapfill",
    (s, d) => {
      val e = Tables.events(s, d)
      val hourly = e.groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      val range = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = e.select(col("event_type")).distinct()
        .crossJoin(broadcast(range))
        .select(col("event_type"),
          explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      spine.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""WITH hourly AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n,
           |    round(sum("value"), 2) AS sum_value
           |  FROM events GROUP BY 1, 2),
           |rng AS (
           |  SELECT date_trunc('hour', min(ts)) AS lo,
           |         date_trunc('hour', max(ts)) AS hi
           |  FROM events),
           |types AS (SELECT DISTINCT event_type FROM events),
           |spine AS (
           |  SELECT t.event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
           |  FROM types t, rng)
           |SELECT s.event_type, s.h, coalesce(n, 0) AS n,
           |  coalesce(sum_value, 0.0) AS sum_value
           |FROM spine s LEFT JOIN hourly USING (event_type, h)
           |ORDER BY event_type, h""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(q26CountByValue, q28EventsHourly, q29JsonExtract, q37Sessionize,
      q56AsofAttribution, q57RangeErrorProximity, q66EventFunnel,
      q67LatestPerUser, q68HourlyGapfill)
}
