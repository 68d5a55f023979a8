package graft.prov

import java.sql.Timestamp
import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Driver-side mutable state for one provenance task node
  * (reference: Task.scala:12-53 + RDD.scala:157-197). Tasks are created
  * eagerly when a transformation is declared (lazy execution, eager DAG —
  * same as the reference) and persisted at flush.
  */
final class TaskState(
    val id: String,
    var ttype: String,
    var description: String,
    val parents: Seq[String],
    var schemaFields: Seq[String] = Seq("Value"),
    var usingDefaultSchema: Boolean = true,
    var ignored: Boolean = false,
    var hasDataInRepository: Boolean = false,
    var group: Option[GroupState] = None,
    /** builds this task's element rows; None for pass-through tasks
      * (union/sort/repartition create no elements — reference:
      * UnionRDD.scala:108)
      */
    var elementThunk: Option[() => Dataset[ElementRow]] = None,
    /** true when `elementThunk` emits the single task-granularity stats
      * element (relational [[RelationalProvenance.Granularity.Task]])
      * instead of per-row elements — children dep-link to its
      * deterministic stats element id.
      */
    var statsElement: Boolean = false,
    var flushed: Boolean = false,
    /** this task's stage plan, pre-materialized in topological order by
      * the flush batch so the single element write reads warm caches
      * (cold caches make the write's concurrent union branches recompute
      * shared prefixes). Set by both layers for element-creating tasks.
      */
    var flushPlan: Option[Dataset[_]] = None,
    /** true when `flushPlan` is NOT session-persisted (the relational
      * layer's deterministic-id frames): the flush batch persists it
      * transiently and releases it when the batch finishes, so the
      * element write costs O(stages), not O(stages²).
      */
    var transientCache: Boolean = false,
    /** true for typed-layer tasks whose element rows are written by the
      * in-plan side-capture wrapper ([[ElementSideWriter]]) during the
      * action itself; flush COMMITS their staged files instead of
      * replaying the stage through a write job.
      */
    var sideCapture: Boolean = false,
    /** Extra element rows beyond the per-record ones — source-FILE
      * elements (textFile/hadoopFile/fileGroup) and dropped-record
      * markers. Small datasets, written by the flush batch's append job.
      */
    var extraThunk: Option[() => Dataset[ElementRow]] = None)

/** Open transformation group (reference: TransformationGroup.scala:6-33,
  * TransformationGroupManager.scala:5-74). Invariants enforced: a task
  * joins at most one group; a group is finished exactly once.
  */
final class GroupState(val id: String, val name: String) {
  val initTasks: mutable.LinkedHashSet[String] = mutable.LinkedHashSet()
  val intermediaryTasks: mutable.LinkedHashSet[String] = mutable.LinkedHashSet()
  var finishTask: Option[String] = None
  def isOpen: Boolean = finishTask.isEmpty
}

object ProvSession {
  implicit val elementRowEnc: Encoder[ElementRow] = Encoders.product[ElementRow]

  /** Resolve a boolean toggle with the reference's precedence (env var
    * beats Spark conf beats the constructor flag — SparkConf.scala:
    * 661-670 honors ENABLE_PROVENANCE/ENABLE_VCS the same way), so ops
    * workflows can flip capture without touching code. Pure and
    * injectable for the spec.
    */
  private[prov] def resolveToggle(env: Map[String, String], envKey: String,
                                  conf: String => Option[String],
                                  confKey: String,
                                  default: Boolean): Boolean =
    env.get(envKey).orElse(conf(confKey)) match {
      case None => default
      case Some(v) => v.trim.toLowerCase match {
        case "true" | "1"  => true
        case "false" | "0" => false
        // fail loudly like the reference's String.toBoolean
        // (SparkConf.scala:661-670): a typo ("ture", "yes") must not
        // silently flip capture off when the constructor asked for it
        case other => throw new IllegalArgumentException(
          s"$envKey/$confKey must be true/false/1/0, got '$other'")
      }
    }

  /** Open a provenance session over a stock SparkSession — the analogue of
    * `new SparkContext(conf)` with provenance enabled (reference:
    * SparkContext.scala:382-390). Nothing is forked: this is a library
    * object holding a task DAG + a parquet sink location.
    *
    * Toggle overrides (reference: SparkConf.scala:661-670): env
    * `GRAFT_ENABLE_PROVENANCE` > conf `spark.graft.enableProvenance` >
    * the `captureEnabled` flag; env `GRAFT_ENABLE_VCS` > conf
    * `spark.graft.enableVersionControl` > whether `versionControl` was
    * passed. Unrecognized values throw — a typo must not silently
    * disable capture.
    *
    * Read-after-action contract (asyncFlush = true, the default):
    * typed record elements are readable in the store as soon as the
    * triggering action returns (they are captured inside the action's
    * own job and committed synchronously), but relational replay rows,
    * file elements, and dropped-record markers land on a background
    * thread — the store is guaranteed COMPLETE only after
    * [[ProvSession.awaitFlushes]] or [[ProvSession.close]]. Pass
    * `asyncFlush = false` for a store that is fully readable after
    * every action.
    */
  def create(spark: SparkSession, appName: String, storeDir: String,
             captureEnabled: Boolean = true,
             captureDropped: Boolean = false,
             versionControl: Option[graft.prov.filegroup.GitVersionControl] = None,
             asyncFlush: Boolean = true): ProvSession = {
    val conf = (k: String) => spark.conf.getOption(k)
    val capture = resolveToggle(sys.env, "GRAFT_ENABLE_PROVENANCE",
      conf, "spark.graft.enableProvenance", captureEnabled)
    val vcs =
      if (resolveToggle(sys.env, "GRAFT_ENABLE_VCS",
        conf, "spark.graft.enableVersionControl", versionControl.nonEmpty))
        versionControl
      else None
    val s = new ProvSession(spark, appName, storeDir, capture,
      captureDropped, vcs, asyncFlush)
    // reference lifecycle: execution branch created at context init
    // (SparkContext.scala:389-390, GitServerManager.scala:90-128)
    vcs.foreach(_.initExecution(s.executionId))
    s
  }
}

/** One provenance-tracked execution (reference: Execution.scala +
  * DataflowProvenance.scala lifecycle).
  *
  * Scale design (SURVEY §7): provenance rows are written THROUGH Spark as
  * batched parquet appends partitioned by execution_id — there is no
  * executor-side connection to any store (the reference async-inserts to
  * Cassandra from every executor thread, DataSource.scala:28-45). Each
  * tracked Dataset is persisted (MEMORY_AND_DISK) so the lineage dump
  * computes every stage once, not O(n²).
  */
final class ProvSession private[prov] (
    val spark: SparkSession,
    val appName: String,
    val storeDir: String,
    val captureEnabled: Boolean,
    val captureDropped: Boolean,
    val versionControl: Option[graft.prov.filegroup.GitVersionControl] = None,
    /** When true (the DEFAULT — the reference likewise writes provenance
      * asynchronously, DataSource.scala:28-45), the flush batch's APPEND
      * job (relational replay rows + file-element/dropped-marker extras)
      * runs on a background thread. Only deterministic-id rows ever run
      * off-thread: typed-layer record elements are side-captured inside
      * the action's own pass and committed synchronously at flush, and
      * any stage the actions never computed is materialized on the
      * flush CALLER's thread — so no random-id stage is ever computed
      * concurrently by a background job and a user action (which could
      * mint divergent element ids across executors).
      *
      * Read-after-action contract: record elements are readable as soon
      * as the triggering action's flush returns; the async extras land
      * by the next [[awaitFlushes]]/[[close]], and the store is
      * guaranteed COMPLETE only after [[close]]. Writes chain
      * sequentially off-thread, so appends never interleave, and the
      * queue is BOUNDED at [[maxPendingFlushes]] batches — a flush
      * beyond the bound blocks the caller (backpressure), so driver
      * memory holds a bounded number of un-written batches no matter
      * how fast actions fire.
      */
    val asyncFlush: Boolean = true,
    /** Bound on queued+running async flush batches (backpressure point). */
    val maxPendingFlushes: Int = 2) {

  import ProvSession._

  val executionId: String = ProvIds.newId()
  private val startTime = new Timestamp(System.currentTimeMillis())
  private var endTime: Option[Timestamp] = None
  private val tasks = mutable.LinkedHashMap[String, TaskState]()
  private val groups = mutable.ListBuffer[GroupState]()
  private val cached = mutable.ListBuffer[Dataset[_]]()
  private val fileGroupRefs = mutable.ListBuffer[FileGroupReferenceRow]()

  // All task-DAG mutations and flush run under `this`-lock: actions may
  // fire from concurrent driver threads (saveFilesAtAsync, parallel job
  // submission), and LinkedHashMap iteration during an unsynchronized
  // flush would race task registration (CME / double-append).
  private[prov] def newTask(ttype: String, parents: Seq[String],
                            description: String): TaskState = synchronized {
    val t = new TaskState(ProvIds.newId(), ttype, description, parents)
    tasks(t.id) = t
    // group propagation (reference: TransformationGroupManager.scala:50-70):
    // a child of a task inside an open group joins that group as an
    // intermediary unless it explicitly finishes it.
    val parentGroups = parents.flatMap(p => tasks.get(p)).flatMap(_.group)
      .filter(_.isOpen).distinct
    require(parentGroups.size <= 1,
      s"task has parents in ${parentGroups.size} distinct open groups; " +
        "a lineage can have at most one open transformation group")
    parentGroups.headOption.foreach { g =>
      t.group = Some(g)
      g.intermediaryTasks += t.id
    }
    t
  }

  private[prov] def track(ds: Dataset[_]): Unit = if (captureEnabled) synchronized {
    ds.persist(StorageLevel.MEMORY_AND_DISK)
    cached += ds
  }

  private[prov] def newGroup(name: String): GroupState = synchronized {
    val g = new GroupState(ProvIds.newId(), name)
    groups += g
    g
  }

  private[prov] def addFileGroupRef(elementId: String, folder: String): Unit = synchronized {
    fileGroupRefs += FileGroupReferenceRow(executionId, elementId, folder)
  }

  def taskById(id: String): Option[TaskState] = synchronized { tasks.get(id) }
  def allTasks: Seq[TaskState] = synchronized { tasks.values.toSeq }

  // ---- sources ------------------------------------------------------

  /** parallelize: each element becomes a fresh root DataElement
    * (reference: SparkContext.scala:737; ParallelCollectionRDD.scala:40-46).
    */
  def parallelize[T](data: Seq[T], description: String = "parallelize")(
      implicit et: Encoder[T], ep: Encoder[ProvRecord[T]]): ProvDataset[T] = {
    val task = newTask(TransformationType.RANGE, Nil, description)
    // distribute via sc.parallelize: createDataset(Seq) builds a
    // LocalRelation that executes on a single thread, serializing every
    // downstream stage of the pipeline
    implicit val ct: scala.reflect.ClassTag[T] = ProvDataset.anyRefTag
    val rdd = spark.sparkContext.parallelize(data,
      spark.sparkContext.defaultParallelism)
    val ds = spark.createDataset(rdd)
      .map(v => ProvRecord(ProvIds.newId(), Seq.empty[String], v))
    ProvDataset.create(ds, task, this)
  }

  /** range: generated-source parity (reference: SparkContext.range via
    * ParallelCollectionRDD). Uses spark.range — rows are generated inside
    * executors, nothing materializes on the driver.
    */
  def range(n: Long, description: String = "range")(
      implicit ep: Encoder[ProvRecord[Long]]): ProvDataset[Long] = {
    val task = newTask(TransformationType.RANGE, Nil, s"$description($n)")
    val ds = spark.range(n)
      .map((v: java.lang.Long) =>
        ProvRecord(ProvIds.newId(), Seq.empty[String], v.longValue()))(ep)
    ProvDataset.create(ds, task, this)
  }

  /** textFile with source-file lineage: each input FILE is itself a data
    * element, and every record depends on its file (reference:
    * HadoopRDD.scala:223-227,318). File element ids are deterministic
    * (name-UUID of executionId+path) so no join is needed to wire record→
    * file edges — each record computes its file's id locally.
    */
  def textFile(path: String, description: String = "textFile"): ProvDataset[String] = {
    import spark.implicits._
    val task = newTask(TransformationType.MAP, Nil, s"$description: $path")
    val execId = executionId
    val ds = spark.read.textFile(path)
      .select(org.apache.spark.sql.functions.col("value"),
              org.apache.spark.sql.functions.input_file_name().as("_file"))
      .as[(String, String)]
      .map { case (line, file) =>
        ProvRecord(ProvIds.newId(), Seq(ProvSinkUtil.fileElementId(execId, file)), line)
      }
    val pd = ProvDataset.create(ds, task, this)
    // file-level elements are emitted alongside the records at flush
    if (captureEnabled) {
      val tid = task.id // capture only strings in executor closures
      task.extraThunk = Some(() =>
        spark.read.textFile(path)
          .select(org.apache.spark.sql.functions.input_file_name().as("f"))
          .distinct().as[String]
          .map(f => ElementRow(execId, tid, ProvSinkUtil.fileElementId(execId, f),
            Seq(Seq(f)), Seq.empty[String])))
    }
    pd
  }

  /** objectFile: read SequenceFiles of java-serialized batches (the
    * stock `saveAsObjectFile` format) with the same source-file lineage
    * as textFile — each record depends on its file's element (reference:
    * SparkContext.scala:1325 via HadoopRDD semantics). Uses
    * HadoopRDD.mapPartitionsWithInputSplit so the file path is known
    * per-record without a join.
    */
  def objectFile[T](path: String, description: String = "objectFile")(
      implicit ep: Encoder[ProvRecord[T]]): ProvDataset[T] = {
    import org.apache.hadoop.io.{BytesWritable, NullWritable}
    import org.apache.hadoop.mapred.{FileSplit, SequenceFileInputFormat}
    val task = newTask(TransformationType.MAP, Nil, s"$description: $path")
    val execId = executionId
    implicit val ct: scala.reflect.ClassTag[ProvRecord[T]] = ProvDataset.anyRefTag
    def raw = spark.sparkContext.hadoopFile(path,
      classOf[SequenceFileInputFormat[NullWritable, BytesWritable]],
      classOf[NullWritable], classOf[BytesWritable],
      spark.sparkContext.defaultParallelism)
      .asInstanceOf[org.apache.spark.rdd.HadoopRDD[NullWritable, BytesWritable]]
    val recs = raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapred.InputSplit,
         it: Iterator[(NullWritable, BytesWritable)]) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        val fid = ProvSinkUtil.fileElementId(execId, file)
        it.flatMap { case (_, bw) =>
          val ois = new java.io.ObjectInputStream(
            new java.io.ByteArrayInputStream(bw.copyBytes()))
          try ois.readObject().asInstanceOf[Array[_]].iterator
            .map(v => ProvRecord(ProvIds.newId(), Seq(fid), v.asInstanceOf[T]))
            .toVector
          finally ois.close()
        }
      }, preservesPartitioning = false)
    val pd = ProvDataset.create(spark.createDataset(recs)(ep), task, this)
    attachFileElements(task, () => raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapred.InputSplit,
         _: Iterator[(NullWritable, BytesWritable)]) =>
        Iterator(split.asInstanceOf[FileSplit].getPath.toString)
      }, preservesPartitioning = false))
    pd
  }

  /** binaryRecords: fixed-length records over the binaryFile reader with
    * textFile-style per-file lineage (reference: SparkContext.scala:976 —
    * FixedLengthBinaryInputFormat). Each file yields
    * floor(length / recordLength) records of exactly `recordLength`
    * bytes; a trailing partial record is dropped, matching the
    * fixed-length reader's whole-records-only contract. Parallelism is
    * per FILE (the binaryFile family's contract here) — fixed-length
    * archives are many small shards in practice, and per-file splitting
    * keeps the record→file edge computable without a join.
    */
  def binaryRecords(path: String, recordLength: Int,
                    description: String = "binaryRecords")(
      implicit ep: Encoder[ProvRecord[Array[Byte]]]): ProvDataset[Array[Byte]] = {
    require(recordLength > 0, s"recordLength must be positive: $recordLength")
    val task = newTask(TransformationType.MAP, Nil,
      s"$description($recordLength): $path")
    val execId = executionId
    def files = spark.read.format("binaryFile").load(path)
    val recs = files
      .select(org.apache.spark.sql.functions.col("path"),
              org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .flatMap { case (file, content) =>
        val fid = ProvSinkUtil.fileElementId(execId, file)
        val n = content.length / recordLength
        (0 until n).iterator.map { i =>
          ProvRecord(ProvIds.newId(), Seq(fid),
            java.util.Arrays.copyOfRange(
              content, i * recordLength, (i + 1) * recordLength))
        }
      }(ep)
    val pd = ProvDataset.create(recs, task, this)
    attachFileElements(task, () =>
      files.select("path").as[String](Encoders.STRING).rdd)
    pd
  }

  /** Wrap `task`'s element thunk so the distinct source FILES flush as
    * elements of the same task (one per file, values = [[path]]) — the
    * file-element half of per-file lineage (reference:
    * HadoopRDD.scala:223-227,318).
    */
  private def attachFileElements(task: TaskState,
      files: () => org.apache.spark.rdd.RDD[String]): Unit =
    if (captureEnabled) {
      val tid = task.id
      val execId = executionId
      task.extraThunk = Some(() =>
        spark.createDataset(files().distinct())(Encoders.STRING)
          .map(f => ElementRow(execId, tid,
            ProvSinkUtil.fileElementId(execId, f),
            Seq(Seq(f)), Seq.empty[String]))(ProvSession.elementRowEnc))
    }

  /** hadoopFile (old `mapred` API) with per-file lineage for ANY
    * InputFormat: each record depends on its source file's element, and
    * the file elements flush alongside (reference:
    * HadoopRDD.scala:223-227,318 attaches the source-file element for
    * every InputFormat, not just text). `conv` maps each (key, value)
    * to the record type INSIDE the split iterator — record readers
    * reuse Writable instances, so `conv` must copy anything it keeps
    * (the same contract as stock `sc.hadoopFile`).
    */
  def hadoopFile[K, V, T](path: String,
      inputFormatClass: Class[_ <: org.apache.hadoop.mapred.InputFormat[K, V]],
      keyClass: Class[K], valueClass: Class[V],
      description: String = "hadoopFile")(conv: (K, V) => T)(
      implicit ep: Encoder[ProvRecord[T]]): ProvDataset[T] = {
    import org.apache.hadoop.mapred.FileSplit
    val task = newTask(TransformationType.MAP, Nil, s"$description: $path")
    val execId = executionId
    implicit val ct: scala.reflect.ClassTag[ProvRecord[T]] = ProvDataset.anyRefTag
    def raw = spark.sparkContext.hadoopFile(path, inputFormatClass,
        keyClass, valueClass, spark.sparkContext.defaultParallelism)
      .asInstanceOf[org.apache.spark.rdd.HadoopRDD[K, V]]
    val recs = raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapred.InputSplit, it: Iterator[(K, V)]) =>
        val fid = ProvSinkUtil.fileElementId(execId,
          split.asInstanceOf[FileSplit].getPath.toString)
        it.map { case (k, v) => ProvRecord(ProvIds.newId(), Seq(fid), conv(k, v)) }
      }, preservesPartitioning = false)
    val pd = ProvDataset.create(spark.createDataset(recs)(ep), task, this)
    attachFileElements(task, () => raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapred.InputSplit, _: Iterator[(K, V)]) =>
        Iterator(split.asInstanceOf[FileSplit].getPath.toString)
      }, preservesPartitioning = false))
    pd
  }

  /** sequenceFile with per-file lineage (reference:
    * SparkContext.scala sequenceFile → HadoopRDD semantics). Same
    * Writable-reuse contract on `conv` as [[hadoopFile]].
    */
  def sequenceFile[K, V, T](path: String, keyClass: Class[K],
      valueClass: Class[V], description: String = "sequenceFile")(
      conv: (K, V) => T)(
      implicit ep: Encoder[ProvRecord[T]]): ProvDataset[T] =
    hadoopFile(path,
      classOf[org.apache.hadoop.mapred.SequenceFileInputFormat[K, V]],
      keyClass, valueClass, description)(conv)

  /** newAPIHadoopFile (`mapreduce` API) with per-file lineage — the
    * NewHadoopRDD mirror of [[hadoopFile]].
    */
  def newAPIHadoopFile[K, V, T](path: String,
      inputFormatClass: Class[_ <: org.apache.hadoop.mapreduce.InputFormat[K, V]],
      keyClass: Class[K], valueClass: Class[V],
      description: String = "newAPIHadoopFile")(conv: (K, V) => T)(
      implicit ep: Encoder[ProvRecord[T]]): ProvDataset[T] = {
    import org.apache.hadoop.mapreduce.lib.input.FileSplit
    val task = newTask(TransformationType.MAP, Nil, s"$description: $path")
    val execId = executionId
    implicit val ct: scala.reflect.ClassTag[ProvRecord[T]] = ProvDataset.anyRefTag
    def raw = spark.sparkContext.newAPIHadoopFile(path,
        inputFormatClass.asInstanceOf[Class[org.apache.hadoop.mapreduce.InputFormat[K, V]]],
        keyClass, valueClass)
      .asInstanceOf[org.apache.spark.rdd.NewHadoopRDD[K, V]]
    val recs = raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapreduce.InputSplit, it: Iterator[(K, V)]) =>
        val fid = ProvSinkUtil.fileElementId(execId,
          split.asInstanceOf[FileSplit].getPath.toString)
        it.map { case (k, v) => ProvRecord(ProvIds.newId(), Seq(fid), conv(k, v)) }
      }, preservesPartitioning = false)
    val pd = ProvDataset.create(spark.createDataset(recs)(ep), task, this)
    attachFileElements(task, () => raw.mapPartitionsWithInputSplit(
      { (split: org.apache.hadoop.mapreduce.InputSplit, _: Iterator[(K, V)]) =>
        Iterator(split.asInstanceOf[FileSplit].getPath.toString)
      }, preservesPartitioning = false))
    pd
  }

  /** Bridge any stock RDD — custom receivers, computed sources — into
    * the provenance surface: each record becomes a fresh root element.
    * For file-based sources prefer [[textFile]]/[[objectFile]]/
    * [[sequenceFile]]/[[hadoopFile]]/[[newAPIHadoopFile]], which carry
    * per-file lineage; this bridge is for RDDs with no file identity.
    */
  def fromRDD[T](rdd: org.apache.spark.rdd.RDD[T],
                 description: String = "fromRDD")(
      implicit ep: Encoder[ProvRecord[T]]): ProvDataset[T] = {
    val task = newTask(TransformationType.MAP, Nil, description)
    implicit val ct: scala.reflect.ClassTag[ProvRecord[T]] = ProvDataset.anyRefTag
    val ds = spark.createDataset(
      rdd.map(v => ProvRecord(ProvIds.newId(), Seq.empty[String], v)))(ep)
    ProvDataset.create(ds, task, this)
  }

  // ---- lifecycle ----------------------------------------------------

  /** Persist all pending provenance (tasks + element rows) — the analogue
    * of checkAndPersistProvenance on action (reference: RDD.scala:1143-1147),
    * but batched: one distributed parquet append for all unflushed tasks.
    */
  // in-flight async element writes, chained so appends to the store
  // directory never interleave
  private var flushChain: scala.concurrent.Future[Unit] =
    scala.concurrent.Future.unit

  private val flushFailures = mutable.ListBuffer[Throwable]()

  // Bounded async queue: one permit per queued-or-running flush batch.
  // flush() past the bound BLOCKS the caller (backpressure), so a driver
  // firing actions faster than the store can absorb holds at most
  // `maxPendingFlushes` un-written batches — bounded memory, no lost
  // rows (close() still awaits everything).
  private val flushPermits =
    new java.util.concurrent.Semaphore(math.max(1, maxPendingFlushes))
  private val flushDepth = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var maxFlushDepth = 0

  /** Queued+running async flush batches right now (≤ maxPendingFlushes). */
  def pendingFlushBatches: Int = flushDepth.get

  /** High-water mark of the async queue depth — the boundedness witness
    * asserted by ProvSpec.
    */
  def maxObservedFlushDepth: Int = maxFlushDepth

  /** Driver conf snapshot shipped into side-capture closures. */
  private[prov] lazy val serializableHadoopConf =
    new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

  def flush(): Unit = if (captureEnabled) {
    // Plan construction + flushed-marking run under the lock: a
    // concurrent second flush sees flushed=true and appends nothing —
    // concurrent actions are idempotent. Marking is optimistic: a failed
    // phase UN-marks its batch's tasks so a later flush retries them
    // (side-capture commits are idempotent, so a retry never duplicates
    // already-committed rows).
    //
    // Two phases:
    //  1. SYNC (caller thread): side-captured tasks' record elements.
    //     Fully-computed stages just get their staged files committed
    //     (renames, no Spark job). A stage the actions never fully
    //     computed is materialized HERE with a count — synchronously, so
    //     a random-id stage is never computed concurrently by the flush
    //     and a user action (which could mint divergent ids across
    //     executors). After this phase the record elements are READABLE.
    //  2. ASYNC-able: one append job for replay tasks (the relational
    //     layer's deterministic-id frames) + extras (file elements,
    //     dropped-record markers) — all safe to recompute off-thread
    //     because their ids are deterministic.
    val planned = synchronized {
      val pending = tasks.values
        .filter(t => !t.flushed && !t.ignored &&
          (t.elementThunk.nonEmpty || t.extraThunk.nonEmpty)).toSeq
      if (pending.isEmpty) None
      else {
        val (side, replay) = pending.partition(_.sideCapture)
        val unions = replay.flatMap(_.elementThunk).map(_.apply()) ++
          pending.flatMap(_.extraThunk).map(_.apply())
        // stages worth pre-materializing before the append job: only
        // those some OTHER pending task's branch will re-read
        // (transitively, through pass-through tasks) — a leaf stage is
        // computed exactly once by its own branch, so a count job for it
        // would be pure overhead. Side-capture stages are materialized
        // by phase 1, so only replay (relational) stages remain.
        val reread: Set[String] = {
          val seen = mutable.Set[String]()
          var frontier = pending.flatMap(_.parents)
          while (frontier.nonEmpty) {
            val next = frontier.filterNot(seen)
            seen ++= next
            frontier = next.flatMap(id => tasks.get(id)).flatMap(_.parents)
          }
          seen.toSet
        }
        val rereadTasks = replay
          .filter(t => t.flushPlan.nonEmpty && reread.contains(t.id))
        // counting one MAXIMAL re-read stage fills every persisted cache
        // beneath it: each combinator's plan embeds its parents' plans as
        // subtrees, so Spark's cache manager substitutes the persisted
        // fragments and populates them bottom-up within that single count
        // job. Counting covered (non-maximal) stages again would be one
        // redundant job each — a linear chain needs ONE count, not one
        // per stage.
        val rereadIds = rereadTasks.map(_.id).toSet
        def ancestors(t: TaskState): Set[String] = {
          val seen = mutable.Set[String]()
          var frontier = t.parents
          while (frontier.nonEmpty) {
            val next = frontier.filterNot(seen)
            seen ++= next
            frontier = next.flatMap(id => tasks.get(id)).flatMap(_.parents)
          }
          seen.toSet
        }
        val covered: Set[String] =
          rereadTasks.flatMap(t => ancestors(t).intersect(rereadIds)).toSet
        val countPlans: Seq[Dataset[_]] =
          rereadTasks.filterNot(t => covered(t.id)).flatMap(_.flushPlan)
        val persistPlans: Seq[Dataset[_]] =
          rereadTasks.filter(_.transientCache).flatMap(_.flushPlan).distinct
        pending.foreach(_.flushed = true)
        Some((side, replay, unions, persistPlans, countPlans))
      }
    }
    planned.foreach { case (side, replay, unions, persistPlans, countPlans) =>
      val unmarkAll = () => synchronized {
        (side ++ replay).foreach(_.flushed = false)
      }
      // ---- phase 1: commit side-captured record elements (sync) ----
      try {
        val hconf = spark.sparkContext.hadoopConfiguration
        side.foreach { t =>
          val s0 = System.nanoTime()
          val (covered, declared) =
            ElementSideWriter.coverage(storeDir, executionId, t.id, hconf)
          val complete = declared match {
            case Some(n) => covered.size == n
            case None    => t.flushPlan.exists(_.rdd.getNumPartitions == 0)
          }
          if (!complete) {
            // cached partitions hit their cache (wrapper doesn't re-run,
            // staged ids stay authoritative); only never-computed
            // partitions run, staging exactly the missing files
            t.flushPlan.foreach(_.count())
            val (c2, d2) =
              ElementSideWriter.coverage(storeDir, executionId, t.id, hconf)
            require(d2.exists(_ == c2.size),
              s"side capture incomplete for task ${t.id} after materialize: " +
                s"covered ${c2.size} of ${d2.getOrElse(-1)}")
          }
          ElementSideWriter.commit(storeDir, executionId, t.id, hconf)
          if (sys.env.contains("GRAFT_PROV_DEBUG"))
            System.err.println(f"[prov]   commit ${t.ttype}: ${(System.nanoTime() - s0) / 1e9}%.2fs")
        }
      } catch { case e: Throwable => unmarkAll(); throw e }
      // ---- phase 2: replay + extras append (async-able) ----
      val job: Option[() => Unit] =
        if (unions.isEmpty) None
        else {
          val all = unions.reduce(_ unionByName _)
          val n = replay.size
          val para = spark.sparkContext.defaultParallelism
          Some(() => {
            val t0 = System.nanoTime()
            // transiently persist plans whose layer does not persist its
            // stages (deterministic-id relational frames): without this,
            // task k's branch replays stages 1..k — O(stages²) per flush.
            // Only worth it for stages a child's branch will re-read.
            persistPlans.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
            try {
              // ANY failure before the append lands un-marks the whole
              // batch, so a later flush retries it instead of silently
              // dropping it (side tasks re-commit idempotently)
              try {
                // materialize re-read stage caches before the write: the
                // union write runs its branches concurrently, and over
                // cold caches those branches race to recompute shared
                // prefixes. One count per MAXIMAL re-read stage fills all
                // the persisted caches beneath it in dependency order
                // (cache substitution happens on plan subtrees)
                countPlans.foreach { p =>
                  val c0 = System.nanoTime()
                  p.count()
                  if (sys.env.contains("GRAFT_PROV_DEBUG"))
                    System.err.println(f"[prov]   materialize: ${(System.nanoTime() - c0) / 1e9}%.2fs")
                }
                // write straight into this execution's partition
                // directory: the dynamic-partition writer (partitionBy)
                // sorts every task's rows by a column that is constant
                // here — path-embedding the single partition value skips
                // that; readers see the same execution_id=... layout via
                // partition discovery. coalesce bounds the commit to
                // defaultParallelism files instead of (branches ×
                // partitions).
                val w0 = System.nanoTime()
                // element ids / deps / values are near-unique strings:
                // dictionary pages only get built and abandoned (same
                // rationale as ElementSideWriter's per-column setting)
                all.drop("execution_id").coalesce(para).write.mode("append")
                  .option("parquet.enable.dictionary", "false")
                  .parquet(s"$storeDir/data_elements/execution_id=$executionId")
                if (sys.env.contains("GRAFT_PROV_DEBUG"))
                  System.err.println(f"[prov]   write: ${(System.nanoTime() - w0) / 1e9}%.2fs")
              } catch {
                case e: Throwable =>
                  unmarkAll()
                  throw e
              }
            } finally persistPlans.foreach(_.unpersist())
            if (sys.env.contains("GRAFT_PROV_DEBUG"))
              System.err.println(f"[prov] append batch ($n replay tasks + extras) in ${(System.nanoTime() - t0) / 1e9}%.2fs")
          })
        }
      job.foreach { j =>
        if (asyncFlush) {
          flushPermits.acquire() // backpressure: block past the bound
          val d = flushDepth.incrementAndGet()
          synchronized { if (d > maxFlushDepth) maxFlushDepth = d }
          synchronized {
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.global
            // recover first: a failed earlier write must not skip THIS
            // write (map on a failed Future never runs) — each job records
            // its own failure and un-marks its tasks, so later flushes
            // still happen and awaitFlushes/close still surface every error
            flushChain = flushChain.recover { case _ => () }.map { _ =>
              try j() catch {
                case e: Throwable =>
                  synchronized { flushFailures += e }
                  throw e
              } finally {
                flushDepth.decrementAndGet()
                flushPermits.release()
              }
            }
          }
        } else j()
      }
    }
  }

  /** Await all in-flight async element writes; rethrows their failures
    * (all async write errors are preserved, not just the first).
    */
  def awaitFlushes(): Unit = {
    val f = synchronized(flushChain)
    scala.util.Try(
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
    val failures = synchronized(flushFailures.toList)
    failures.headOption.foreach { first =>
      failures.drop(1).foreach(first.addSuppressed)
      synchronized(flushFailures.clear())
      throw first
    }
  }

  /** Finish the execution: flush elements, write the driver-side tables
    * (executions, tasks, transformation_groups, file_group_references),
    * release caches (reference: SparkContext.scala:1975-1976 →
    * DataflowProvenance.finish).
    */
  def close(): Unit = {
    flush()
    awaitFlushes() // surface any async write failure before finishing
    closeInternal()
  }

  private def closeInternal(): Unit = synchronized {
    val close0 = System.nanoTime()
    endTime = Some(new Timestamp(System.currentTimeMillis()))
    if (captureEnabled) {
      // driver-side parquet writes (MetaParquet): these tables hold a
      // handful of rows, and a Spark write job costs ~0.3s of fixed
      // scheduler/commit overhead per close. Layout matches the former
      // partitionBy("execution_id") output byte-for-byte in structure:
      // partition value path-embedded, data columns in the same order.
      import MetaParquet._
      val hconf = spark.sparkContext.hadoopConfiguration
      append(hconf, s"$storeDir/executions/execution_id=$executionId",
        Seq("app_name" -> FString, "start_time" -> FTimestamp,
          "end_time" -> FTimestamp),
        Seq(Seq(appName, startTime, endTime)))
      append(hconf, s"$storeDir/tasks/execution_id=$executionId",
        Seq("task_id" -> FString, "description" -> FString,
          "transformation_type" -> FString, "using_default_schema" -> FBool,
          "schema_fields" -> FStringList, "has_data_in_repository" -> FBool,
          "is_ignored" -> FBool, "dependencies" -> FStringList),
        tasks.values.toSeq.map(t => Seq(
          t.id, t.description, t.ttype, t.usingDefaultSchema,
          t.schemaFields, t.hasDataInRepository, t.ignored, t.parents)))
      if (groups.nonEmpty) {
        append(hconf,
          s"$storeDir/transformation_groups/execution_id=$executionId",
          Seq("group_id" -> FString, "name" -> FString,
            "init_tasks" -> FStringList, "intermediary_tasks" -> FStringList,
            "finish_task" -> FString),
          groups.toSeq.map(g => Seq(g.id, g.name, g.initTasks.toSeq,
            g.intermediaryTasks.toSeq, g.finishTask.getOrElse(""))))
      }
      if (fileGroupRefs.nonEmpty) {
        append(hconf,
          s"$storeDir/file_group_references/execution_id=$executionId",
          Seq("element_id" -> FString, "folder_path" -> FString),
          fileGroupRefs.toSeq.map(r => Seq(r.element_id, r.folder_path)))
      }
    }
    // reference: VersionControl.finish on sc.stop
    // (SparkContext.scala:1975-1976, VersionControl.scala:134-157)
    versionControl.foreach(_.finish(executionId))
    // orphaned side-capture attempts (ignored tasks, post-flush
    // recomputes, superseded attempts) — committed files are untouched
    if (captureEnabled)
      try ElementSideWriter.cleanupStaging(storeDir, executionId,
        spark.sparkContext.hadoopConfiguration)
      catch { case scala.util.control.NonFatal(_) => () }
    cached.foreach(_.unpersist())
    cached.clear()
    if (sys.env.contains("GRAFT_PROV_DEBUG"))
      System.err.println(f"[prov] close tables+cleanup: ${(System.nanoTime() - close0) / 1e9}%.2fs")
  }
}

private[prov] object ProvSinkUtil {
  /** Deterministic v3-style id for a source file element. */
  def fileElementId(executionId: String, path: String): String =
    java.util.UUID.nameUUIDFromBytes(s"$executionId|$path".getBytes("UTF-8")).toString
}
