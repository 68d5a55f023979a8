package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.Tables
import graft.prov._

/** End-to-end provenance showcase exposed through the driver contract.
  * Each query builds a provenance-tracked pipeline over the testdata,
  * closes the session (flushing the parquet provenance store), then
  * answers a SURVEY §3.3 query over the store. Not SQL-expressible →
  * rows-only checks (element ids are freshly minted per run).
  */
object ProvShowcaseQueries {

  /** Run a small tracked pipeline (source → mapValues → reduceByKey) over
    * order statuses and return (store, session, reduce-task id).
    * The sample is DETERMINISTIC (sorted by the unique o_orderkey before
    * the limit), so every derived store content is value-reproducible —
    * what lets prov_lineage carry a REAL computed oracle instead of a
    * rows-only check.
    */
  private def trackedPipeline(s: org.apache.spark.sql.SparkSession,
                              d: String): (String, ProvSession, String) = {
    val spark = s
    import spark.implicits._
    val store = Files.createTempDirectory("provshowcase").toString
    val sess = ProvSession.create(s, "showcase", store)
    val statuses = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey")).limit(500)
      .select(col("o_orderstatus")).as[String]
      .collect().toSeq
    val src = sess.parallelize(statuses, "order statuses")
    val pairs = src.map(st => (st, 1), "to pairs")
    val counts = pairs.reduceByKey(_ + _, "count per status")
    counts.collect()
    sess.close()
    (store, sess, counts.taskId)
  }

  /** Full retrospective graph (reference: DataElementAPICtrl.kt:41-103),
    * summarized ID-FREE through the PUBLIC facade
    * [[ProvenanceQueries.graphSummary]] (round-12: the projection was
    * lifted out of this gate into the API — facade ≡ gate, like every
    * other surface): element-node counts per producing task and
    * lineage-edge counts per (target task, source task) pair. For the
    * tracked pipeline both are DuckDB-derivable from orders alone —
    * sample size N element nodes at the source and map tasks,
    * distinct-status nodes at the reduce task, and N edges along each
    * task hop (every pair depends on exactly one status, every group
    * on all its pairs) — so the graph row carries a real cross-engine
    * oracle. The id-bearing node/edge shape remains available via
    * [[ProvenanceQueries.fullGraph]] (the HTML/server path).
    */
  val provFullGraph = QueryDef(
    "prov_full_graph",
    (s, d) => {
      val (store, sess, _) = trackedPipeline(s, d)
      new ProvenanceQueries(s, store).graphSummary(sess.executionId)
    },
    Some("""WITH sample AS (
           |  SELECT o_orderstatus AS st FROM orders
           |  ORDER BY o_orderkey LIMIT 500),
           |n AS (SELECT count(*) AS c, count(DISTINCT st) AS g FROM sample)
           |SELECT kind, dst, src, n FROM (
           |  SELECT 'element' AS kind, 'order statuses' AS dst,
           |         '' AS src, c AS n FROM n
           |  UNION ALL SELECT 'element', 'to pairs', '', c FROM n
           |  UNION ALL SELECT 'element', 'count per status', '', g FROM n
           |  UNION ALL SELECT 'edge', 'to pairs', 'order statuses', c FROM n
           |  UNION ALL SELECT 'edge', 'count per status', 'to pairs', c
           |    FROM n)
           |ORDER BY kind, dst, src""".stripMargin))

  /** Prospective task graph (reference: TaskAPICtrl.kt:22-36),
    * summarized ID-FREE so it can carry a real committed-expectation
    * oracle (the fg_blackbox pattern): one row per task with its
    * transformation type, upstream count, and sorted upstream
    * descriptions. For the fixed 3-op tracked pipeline this content is
    * a run-independent CONSTANT — asserting it is the whole point of a
    * prospective graph (it is the pipeline's specification; only the
    * task ids are minted per run, and they are exactly what the
    * summary drops). The id-bearing nodes+edges shape remains
    * available via [[ProvenanceQueries.taskGraph]] (the HTML/server
    * path).
    */
  val provTaskGraph = QueryDef(
    "prov_task_graph",
    (s, d) => {
      val (store, sess, _) = trackedPipeline(s, d)
      val q = new ProvenanceQueries(s, store)
      val nodes = q.tasks(sess.executionId)
        .select(col("task_id"), col("description"),
          col("transformation_type"))
      val ups = nodes.select(col("task_id").as("sid"),
        col("description").as("upstream"))
      nodes.alias("t")
        .join(q.taskDependencies(sess.executionId).alias("e"),
          col("e.target") === col("t.task_id"), "left")
        .join(ups.alias("u"), col("e.source") === col("sid"), "left")
        .groupBy(col("t.description"), col("t.transformation_type"))
        .agg(count(col("upstream")).as("n_upstream"),
          concat_ws(",", sort_array(collect_list(col("upstream"))))
            .as("upstreams"))
        .orderBy(col("t.description"))
    },
    // the committed prospective-graph expectation: 3 tasks, RANGE →
    // MAP → REDUCE_BY_KEY, each wired to its upstream by description
    Some("""SELECT * FROM (VALUES
           |  ('count per status', 'REDUCE_BY_KEY', CAST(1 AS BIGINT),
           |   'to pairs'),
           |  ('order statuses', 'RANGE', CAST(0 AS BIGINT), ''),
           |  ('to pairs', 'MAP', CAST(1 AS BIGINT), 'order statuses'))
           |  t(description, transformation_type, n_upstream, upstreams)
           |ORDER BY description""".stripMargin))

  /** Value table of the aggregation task
    * (reference: DataElementAPICtrl.kt:181-233), summarized ID-FREE
    * (the round-9 prov_task_graph pattern): the (header, row) multiset
    * of the reduce task over the deterministic 500-row status sample
    * IS the per-status count table, which DuckDB re-derives from
    * orders alone — so the row carries a real cross-engine oracle.
    * Element ids stay available via [[ProvenanceQueries.valueTable]]
    * (the HTML/server path); they are exactly what the summary drops.
    */
  val provValueTable = QueryDef(
    "prov_value_table",
    (s, d) => {
      val (store, sess, tid) = trackedPipeline(s, d)
      new ProvenanceQueries(s, store).valueTable(sess.executionId, tid)
        .select(concat_ws(",", col("schema_fields")).as("header"),
                concat_ws(",", col("row_values")).as("row_csv"))
        .orderBy(col("row_csv"))
    },
    // header = reduceByKey's default (Key, Value) schema; rows = the
    // per-status counts of the sorted-500 sample
    Some("""WITH sample AS (
           |  SELECT o_orderstatus AS st FROM orders
           |  ORDER BY o_orderkey LIMIT 500)
           |SELECT 'Key,Value' AS header,
           |       st || ',' || CAST(cnt AS VARCHAR) AS row_csv
           |FROM (SELECT st, count(*) AS cnt FROM sample GROUP BY st)
           |ORDER BY row_csv""".stripMargin))

  /** Multi-hop lineage closure of one aggregated element — the first
    * provenance row with a REAL cross-engine oracle (previously all
    * prov_* rows were rows-only): the target element is chosen
    * deterministically (the aggregate whose status payload is minimal),
    * and the summarized closure — ancestors per hop × producing task,
    * with their payload heads — is something DuckDB can RE-DERIVE from
    * the orders table alone: hop 1 = the (status, 1) pairs for the
    * target status, hop 2 = their source statuses, both exactly as
    * numerous as that status is in the deterministic 500-row sample,
    * and every ancestor's payload head IS the target status. Element
    * ids are still freshly minted per run — the oracle checks the
    * id-free content, which is the part lineage capture must get
    * right.
    */
  val provLineage = QueryDef(
    "prov_lineage",
    (s, d) => {
      val (store, sess, tid) = trackedPipeline(s, d)
      val q = new ProvenanceQueries(s, store)
      val anElement = q.producedBy(sess.executionId, tid)
        .orderBy(col("values").getItem(0).getItem(0))
        .select(col("element_id")).head().getString(0)
      q.lineageOf(sess.executionId, anElement)
        .join(q.elements(sess.executionId)
          .select(col("element_id").as("id"), col("task_id"),
            col("values").getItem(0).getItem(0).as("payload_head")), "id")
        .join(q.tasks(sess.executionId)
          .select(col("task_id"), col("description")), "task_id")
        .groupBy(col("hop"), col("description"))
        .agg(count(lit(1)).as("n_ancestors"),
          countDistinct(col("payload_head")).as("n_payload_heads"),
          min(col("payload_head")).as("payload_head"))
        .orderBy(col("hop"), col("description"))
    },
    Some("""WITH sample AS (
           |  SELECT o_orderstatus AS st FROM orders
           |  ORDER BY o_orderkey LIMIT 500),
           |tgt AS (SELECT min(st) AS st FROM sample),
           |nf AS (
           |  SELECT count(*) AS c FROM sample JOIN tgt ON sample.st = tgt.st)
           |SELECT hop, description, n_ancestors, n_payload_heads,
           |       payload_head FROM (
           |  SELECT CAST(1 AS INT) AS hop, 'to pairs' AS description,
           |    c AS n_ancestors, CAST(1 AS BIGINT) AS n_payload_heads,
           |    (SELECT st FROM tgt) AS payload_head FROM nf
           |  UNION ALL
           |  SELECT CAST(2 AS INT), 'order statuses', c, CAST(1 AS BIGINT),
           |    (SELECT st FROM tgt) FROM nf)
           |ORDER BY hop, description""".stripMargin))

  /** Documents pipeline under provenance with dropped-record capture ON:
    * filter (short docs dropped → don't-pass lineage) → fingerprint map
    * → distinct. Returns per-task counts — elements per task, plus the
    * DROPPED-RECORD total carried by the per-partition don't-pass
    * markers' deps (the full FilterMapPartitionsRDD semantics) — all
    * re-derivable by DuckDB from the documents table (round 10: the
    * deterministic sample + string fingerprint turned this from a
    * rows-only check into a real cross-engine oracle).
    */
  val provDocsPipeline = QueryDef(
    "prov_docs_pipeline",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val store = Files.createTempDirectory("provdocs").toString
      val sess = ProvSession.create(s, "docs-pipeline", store,
        captureDropped = true)
      // deterministic sample (sorted by the unique doc_id before the
      // limit) + a STRING fingerprint (sorted distinct tokens), so every
      // per-task count below is a value DuckDB re-derives from the
      // documents table with its own list functions
      val texts = Tables.documents(s, d)
        .orderBy(col("doc_id")).limit(200)
        .select(col("text")).as[String].collect().toSeq
      val src = sess.parallelize(texts, "documents")
      val kept = src.filter(_.length >= 200, "drop short docs")
      val prints = kept.map(t => t.split(" ").distinct.sorted.mkString("|"),
        "fingerprint")
      val uniq = prints.distinct()
      uniq.count()
      sess.close()
      // summarized id-free AND partition-independent: don't-pass markers
      // are minted per partition (their element count varies with
      // parallelism), but their deps are exactly the dropped records'
      // ids — sum(size(deps)) is the dropped-record count, stable at any
      // partitioning
      val q = new ProvenanceQueries(s, store)
      q.elements(sess.executionId)
        .withColumn("is_dp",
          col("values").getItem(0).getItem(0).startsWith("don't-pass"))
        .withColumn("kind", when(col("is_dp"), lit("dropped_records"))
          .otherwise(lit("element")))
        .withColumn("unit", when(col("is_dp"), size(col("deps")))
          .otherwise(lit(1)))
        .groupBy(col("task_id"), col("kind"))
        .agg(sum(col("unit")).cast("long").as("n"))
        .join(q.tasks(sess.executionId).select(col("task_id"),
          col("description")), "task_id")
        .select(col("description"), col("kind"), col("n"))
        .orderBy(col("description"), col("kind"))
    },
    Some("""WITH sample AS (
           |  SELECT text FROM documents ORDER BY doc_id LIMIT 200),
           |tot AS (SELECT count(*) AS n_docs FROM sample),
           |k AS (SELECT count(*) AS kept FROM sample
           |      WHERE length(text) >= 200),
           |u AS (SELECT count(DISTINCT array_to_string(list_sort(
           |        list_distinct(string_split(text, ' '))), '|')) AS uniq
           |      FROM sample WHERE length(text) >= 200)
           |SELECT description, kind, n FROM (
           |  SELECT 'documents' AS description, 'element' AS kind,
           |         n_docs AS n FROM tot
           |  UNION ALL SELECT 'drop short docs', 'element', kept FROM k
           |  UNION ALL SELECT 'drop short docs', 'dropped_records',
           |    n_docs - kept FROM tot, k
           |  UNION ALL SELECT 'fingerprint', 'element', kept FROM k
           |  UNION ALL SELECT 'distinct', 'element', uniq FROM u)
           |ORDER BY description, kind""".stripMargin))

  /** Events pipeline under provenance — the reference's entry-point-A
    * lifecycle (SparkSci entry point: ingest → transforms → aggregate →
    * retrospective query) over the events table: an hour-truncated
    * event sample → key by (hour, event_type) → reduceByKey computing
    * (count, sum) — the batch shape of a windowed aggregation — then
    * per-task element counts plus the aggregation's lineage fan-in
    * histogram (each agg element's dep count = its bucket's event
    * count), all DuckDB-re-derivable from the events table (round 10:
    * the id-free summary turned this from a rows-only check into a
    * real cross-engine oracle). Closes the last capability × surface
    * cell: docs, FileGroup and relational all had prov_* showcases;
    * events did not. Multi-hop closure semantics stay gated via
    * [[provLineage]].
    */
  val provEventsPipeline = QueryDef(
    "prov_events_pipeline",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val store = Files.createTempDirectory("provevents").toString
      val sess = ProvSession.create(s, "events-pipeline", store)
      // deterministic sample: sorted before limit, so identical rows are
      // interchangeable and the bucket sizes below are stable per run
      val evs = Tables.events(s, d)
        .select(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          col("event_type"), col("value"))
        .orderBy(col("hour_us"), col("event_type"), col("value"))
        .limit(300)
        .as[(Long, String, Double)].collect().toSeq
      val src = sess.parallelize(evs, "events sample")
      val keyed = src.map(e => ((e._1, e._2), (1L, e._3)), "key by hour+type")
      val agg = keyed.reduceByKey((a, b) => (a._1 + b._1, a._2 + b._2),
        "hourly agg")
      agg.collect()
      sess.close()
      // summarized id-free (round 10): per-task element counts + the
      // aggregation's lineage FAN-IN histogram — each agg element's dep
      // count IS its (hour, type) bucket's event count, so the whole
      // histogram is a value DuckDB re-derives from the events table;
      // capture must fan in exactly as many lineage edges per bucket as
      // the untracked aggregation would consume rows
      val q = new ProvenanceQueries(s, store)
      val els = q.elements(sess.executionId)
      val descs = q.tasks(sess.executionId)
        .select(col("task_id"), col("description"))
      val counts = els.groupBy(col("task_id"))
        .agg(count(lit(1)).as("n"))
        .join(descs, "task_id")
        .select(lit("elements").as("kind"),
          col("description").as("key"), col("n"))
      val fanin = els.join(descs, "task_id")
        .filter(col("description") === "hourly agg")
        .select(size(col("deps")).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n"))
        .select(lit("fanin").as("kind"),
          format_string("%04d", col("sz")).as("key"), col("n"))
      counts.unionByName(fanin).orderBy(col("kind"), col("key"))
    },
    Some("""WITH smp AS (
           |  SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           |         event_type, value
           |  FROM events ORDER BY hour_us, event_type, value LIMIT 300),
           |g AS (SELECT hour_us, event_type, count(*) AS sz
           |      FROM smp GROUP BY 1, 2)
           |SELECT kind, key, n FROM (
           |  SELECT 'elements' AS kind, 'events sample' AS key,
           |         (SELECT count(*) FROM smp) AS n
           |  UNION ALL SELECT 'elements', 'key by hour+type',
           |    (SELECT count(*) FROM smp)
           |  UNION ALL SELECT 'elements', 'hourly agg',
           |    (SELECT count(*) FROM g)
           |  UNION ALL SELECT 'fanin', printf('%04d', sz),
           |    count(*) FROM g GROUP BY sz)
           |ORDER BY kind, key""".stripMargin))

  /** Record-level STREAMING lineage over the events table — the last
    * capability × surface cell as a showcase (the mechanism itself is
    * spec-proven in StreamingProvenanceSpec): a deterministic event
    * sample replayed through a two-batch stream into
    * [[StreamingProvenance.trackedRecords]], whose per-user aggregate
    * updates depend on exactly the contributing records still inside
    * the 10-minute watermark horizon. The returned summary counts, per
    * element kind, the elements minted and the lineage edges they
    * carry — record elements are dep-free leaves, aggregate updates
    * carry one dep per in-horizon record, so the dep total audits the
    * horizon bound itself. Round 10: the two-batch replay makes the
    * watermark trajectory deterministic, so the horizon-bounded dep
    * counts carry a real DuckDB oracle — the board's last rows-only
    * row graduated.
    */
  val provEventsStream = QueryDef(
    "prov_events_stream",
    (s, d) => {
      val spark = s
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val store = Files.createTempDirectory("provstream").toString
      val sess = ProvSession.create(s, "events-stream", store)
      val evs = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id")).limit(200)
        .as[graft.streaming.EventStreams.Event].collect().toSeq
      val (first, rest) = evs.splitAt(100)
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.EventStreams.Event]
      val q = StreamingProvenance
        .trackedRecords(sess, stream.toDS(), horizonMinutes = 10,
          "events sample")
        .start()
      try {
        stream.addData(first); q.processAllAvailable()
        stream.addData(rest); q.processAllAvailable()
      } finally q.stop()
      sess.close()
      val pq = new ProvenanceQueries(s, store)
      pq.elements(sess.executionId)
        .withColumn("kind",
          when(size(col("deps")) > 0, lit("agg_update")).otherwise(lit("record")))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_elements"),
          sum(size(col("deps"))).as("n_lineage_edges"))
        .orderBy(col("kind"))
    },
    // round 10: the watermark horizon is itself deterministic for the
    // fixed two-batch replay (batch 1 runs at watermark 0; batch 2 at
    // max(batch-1 ts) − 10 min; the sorted split means no late drops),
    // so DuckDB re-derives every count: 200 dep-free record elements,
    // one agg update per (user, batch-with-events) whose deps are that
    // user's records still inside the horizon — the LAST prov row
    // graduates from rows-only to a real cross-engine oracle
    Some("""WITH smp AS (
           |  SELECT event_id, user_id, epoch_ms(ts) AS tms,
           |         row_number() OVER (ORDER BY ts, event_id) AS rn
           |  FROM (SELECT * FROM events ORDER BY ts, event_id LIMIT 200)),
           |b1 AS (SELECT * FROM smp WHERE rn <= 100),
           |b2u AS (SELECT DISTINCT user_id FROM smp WHERE rn > 100),
           |wm2 AS (SELECT max(tms) - 600000 AS wm FROM b1),
           |a1 AS (SELECT user_id, count(*) AS deps FROM b1 GROUP BY user_id),
           |a2 AS (
           |  SELECT u.user_id,
           |    (SELECT count(*) FROM smp s WHERE s.user_id = u.user_id
           |       AND s.tms >= (SELECT wm FROM wm2)) AS deps
           |  FROM b2u u)
           |SELECT kind, n_elements, n_lineage_edges FROM (
           |  SELECT 'agg_update' AS kind,
           |    (SELECT count(*) FROM a1) + (SELECT count(*) FROM a2)
           |      AS n_elements,
           |    CAST((SELECT sum(deps) FROM a1) + (SELECT sum(deps) FROM a2)
           |      AS BIGINT) AS n_lineage_edges
           |  UNION ALL
           |  SELECT 'record', (SELECT count(*) FROM smp), CAST(0 AS BIGINT))
           |ORDER BY kind""".stripMargin))

  /** Relational-surface provenance (beyond reference parity — the
    * reference's SQL layer has none, SURVEY §1.3): a DataFrame pipeline
    * (scan → filter → join → agg) tracked through [[ProvFrame]], with
    * deterministic element ids and lineage flowing as plan columns.
    * Returns per-task element counts — and since ProvFrame mints one
    * element per tracked row, every count is RE-DERIVABLE by DuckDB
    * from the source tables alone (scan = table cardinality, filter =
    * predicate count, join = join cardinality, agg = group count), so
    * this row carries a real cross-engine oracle: capture must count
    * exactly what the untracked relational pipeline would.
    */
  val provRelational = QueryDef(
    "prov_relational",
    (s, d) => {
      val store = Files.createTempDirectory("provrel").toString
      val sess = ProvSession.create(s, "relational", store)
      val o = RelationalProvenance.table(sess, Tables.orders(s, d),
        "orders", Seq("o_orderkey"))
      val l = RelationalProvenance.table(sess, Tables.lineitem(s, d),
        "lineitem", Seq("l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey", "l_extendedprice"))
      val of = o.filter(col("o_orderstatus") === "F", "open orders")
      val j = of.join(l, col("o_orderkey") === col("l_orderkey"),
        "inner", "orders-lineitem")
      val agg = j.groupByAgg(Seq(col("l_returnflag")),
        Seq(count(lit(1)).as("n")), "per returnflag")
      agg.result.collect()
      sess.close()
      val q = new ProvenanceQueries(s, store)
      q.elements(sess.executionId)
        .groupBy(col("task_id")).agg(count(lit(1)).as("n_elements"))
        .join(q.tasks(sess.executionId)
          .select(col("task_id"), col("description")), "task_id")
        .select(col("description"), col("n_elements"))
        .orderBy(col("description"))
    },
    Some("""SELECT description, n_elements FROM (
           |  SELECT 'open orders: =(o_orderstatus, ''F'')' AS description,
           |    (SELECT count(*) FROM orders
           |     WHERE o_orderstatus = 'F') AS n_elements
           |  UNION ALL SELECT 'orders-lineitem',
           |    (SELECT count(*) FROM orders JOIN lineitem
           |     ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F')
           |  UNION ALL SELECT 'per returnflag',
           |    (SELECT count(DISTINCT l_returnflag) FROM lineitem l
           |     JOIN orders o ON o_orderkey = l_orderkey
           |     WHERE o_orderstatus = 'F')
           |  UNION ALL SELECT 'table: lineitem',
           |    (SELECT count(*) FROM lineitem)
           |  UNION ALL SELECT 'table: orders',
           |    (SELECT count(*) FROM orders)
           |) ORDER BY description""".stripMargin))

  /** The relational granularity knob under the gate: the SAME pipeline
    * as prov_relational captured at
    * [[RelationalProvenance.Granularity.Task]] — one stats element per
    * task carrying its output row count, ZERO per-row elements (the
    * 100 TB capture mode; PARITY "relational capture at scale"). The
    * per-task counts DuckDB re-derives from the source tables are
    * identical to the element-granularity row's, so the scale lever
    * itself is oracle-gated: task-level capture must count exactly
    * what record-level capture would.
    */
  val provRelationalTask = QueryDef(
    "prov_relational_task",
    (s, d) => {
      val store = Files.createTempDirectory("provreltask").toString
      val sess = ProvSession.create(s, "relational-task", store)
      val o = RelationalProvenance.table(sess, Tables.orders(s, d),
        "orders", Seq("o_orderkey"), RelationalProvenance.Granularity.Task)
      val l = RelationalProvenance.table(sess, Tables.lineitem(s, d),
        "lineitem", Seq("l_orderkey", "l_linenumber", "l_partkey",
          "l_suppkey", "l_extendedprice"),
        RelationalProvenance.Granularity.Task)
      val of = o.filter(col("o_orderstatus") === "F", "open orders")
      val j = of.join(l, col("o_orderkey") === col("l_orderkey"),
        "inner", "orders-lineitem")
      val agg = j.groupByAgg(Seq(col("l_returnflag")),
        Seq(count(lit(1)).as("n")), "per returnflag")
      agg.result.collect()
      sess.close()
      val q = new ProvenanceQueries(s, store)
      q.elements(sess.executionId)
        .select(col("task_id"),
          element_at(element_at(col("values"), 1), 2).cast("long")
            .as("n_rows"))
        .join(q.tasks(sess.executionId)
          .select(col("task_id"), col("description")), "task_id")
        .select(col("description"), col("n_rows"))
        .orderBy(col("description"))
    },
    Some("""SELECT description, n_rows FROM (
           |  SELECT 'open orders: =(o_orderstatus, ''F'')' AS description,
           |    (SELECT count(*) FROM orders
           |     WHERE o_orderstatus = 'F') AS n_rows
           |  UNION ALL SELECT 'orders-lineitem',
           |    (SELECT count(*) FROM orders JOIN lineitem
           |     ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F')
           |  UNION ALL SELECT 'per returnflag',
           |    (SELECT count(DISTINCT l_returnflag) FROM lineitem l
           |     JOIN orders o ON o_orderkey = l_orderkey
           |     WHERE o_orderstatus = 'F')
           |  UNION ALL SELECT 'table: lineitem',
           |    (SELECT count(*) FROM lineitem)
           |  UNION ALL SELECT 'table: orders',
           |    (SELECT count(*) FROM orders)
           |) ORDER BY description""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(provFullGraph, provTaskGraph, provValueTable, provLineage,
      provDocsPipeline, provEventsPipeline, provEventsStream,
      provRelational, provRelationalTask)
}
