package graft.prov.javaapi

import _root_.java.{lang => jl, util => ju}

import scala.jdk.CollectionConverters._
import scala.reflect.ClassTag

import org.apache.spark.api.java.function.{FilterFunction, FlatMapFunction, ForeachFunction, MapFunction, MapPartitionsFunction, ReduceFunction}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.prov._
import graft.prov.javaapi.function.PairFlatMapFunctionWithProvRecordAndTask

/** Java-friendly view of [[graft.prov.ProvDataset]] — the analogue of the
  * reference's `JavaRDD` mirror (core/src/main/scala/org/apache/spark/api/
  * java/JavaRDD.scala, JavaRDDLike.scala), restyled after Spark's own Java
  * `Dataset` conventions: `org.apache.spark.api.java.function.*` functional
  * interfaces plus an explicit `Encoder` wherever the element type changes
  * (Java has no implicit TypeTag derivation). Every method delegates to the
  * Scala `ProvDataset`, so provenance semantics — task nodes, element ids,
  * dependency wiring, ignoreIt splicing, group invariants — are byte-for-byte
  * the same as the Scala surface; this class adds no capture logic of its own.
  *
  * Collection-typed results use Scala types (`scala.collection.immutable.Seq`
  * in `groupByKey`/`cogroup` values, `scala.Option` in outer joins) because
  * converting would insert an extra provenance task between the operation and
  * its consumer; `scala.jdk.javaapi.CollectionConverters` /
  * `scala.Option.getOrElse` make them usable from Java.
  */
final class JavaProvDataset[T] private[javaapi] (
    val rdd: ProvDataset[T], val encoder: Encoder[T]) {

  private implicit def recEnc[U](implicit e: Encoder[U]): Encoder[ProvRecord[U]] =
    JavaEncoders.provRecord(e)

  private def anyTag[A]: ClassTag[A] = ClassTag.AnyRef.asInstanceOf[ClassTag[A]]

  /** The wrapped Scala dataset (mirror of `JavaRDD.rdd`). */
  def scalaProv: ProvDataset[T] = rdd

  def taskId: String = rdd.taskId

  // ---- provenance-control surface (SURVEY §2.9) ----------------------

  def ignoreIt(): JavaProvDataset[T] = { rdd.ignoreIt(); this }
  def setName(name: String): JavaProvDataset[T] = { rdd.setName(name); this }
  def setTransformationType(t: String): JavaProvDataset[T] =
    { rdd.setTransformationType(t); this }
  def setSchema(s: DataElementSchema[T]): JavaProvDataset[T] =
    { rdd.setSchema(s); this }
  def initTransformationGroup(g: GroupState): JavaProvDataset[T] =
    { rdd.initTransformationGroup(g); this }
  def finishTransformationGroup(g: GroupState): JavaProvDataset[T] =
    { rdd.finishTransformationGroup(g); this }

  // ---- element-wise transforms ---------------------------------------

  def map[U](f: MapFunction[T, U], e: Encoder[U]): JavaProvDataset[U] =
    new JavaProvDataset(rdd.map(t => f.call(t))(recEnc(e)), e)

  def flatMap[U](f: FlatMapFunction[T, U], e: Encoder[U]): JavaProvDataset[U] =
    new JavaProvDataset(rdd.flatMap(t => f.call(t).asScala)(recEnc(e)), e)

  def filter(f: FilterFunction[T]): JavaProvDataset[T] =
    new JavaProvDataset(rdd.filter(t => f.call(t)), encoder)

  def mapPartitions[U](f: MapPartitionsFunction[T, U],
                       e: Encoder[U]): JavaProvDataset[U] =
    new JavaProvDataset(
      rdd.mapPartitions(it => f.call(it.asJava).asScala)(recEnc(e)), e)

  /** mapPartitions over the full provenance records — the Java surface the
    * reference exposes (JavaRDDLike.scala:151-158 hands the function
    * `Iterator&lt;DataElement&lt;T&gt;&gt;`). The caller sees each input's id and
    * deps and constructs the outputs' provenance directly.
    */
  def mapPartitionsWithProvRecords[U](
      f: FlatMapFunction[ju.Iterator[ProvRecord[T]], ProvRecord[U]],
      e: Encoder[U]): JavaProvDataset[U] = {
    val t = rdd.session.newTask(TransformationType.MAP_PARTITIONS_WITH_INDEX,
      Seq(rdd.task.id), "mapPartitionsWithProvRecords")
    val out = rdd.ds.mapPartitions(it => f.call(it.asJava).asScala)(recEnc(e))
    new JavaProvDataset(ProvDataset.create(out, t, rdd.session), e)
  }

  // ---- to pairs -------------------------------------------------------

  def keyBy[K](f: MapFunction[T, K], ek: Encoder[K]): JavaPairProvDataset[K, T] = {
    implicit val e: Encoder[ProvRecord[(K, T)]] =
      JavaEncoders.provRecord(Encoders.tuple(ek, encoder))
    new JavaPairProvDataset(rdd.keyBy(t => f.call(t)), ek, encoder)
  }

  def mapToPair[K, V](f: MapFunction[T, (K, V)], ek: Encoder[K],
                      ev: Encoder[V]): JavaPairProvDataset[K, V] = {
    val e = Encoders.tuple(ek, ev)
    new JavaPairProvDataset(rdd.map(t => f.call(t), "mapToPair")(recEnc(e)), ek, ev)
  }

  def flatMapToPair[K, V](f: FlatMapFunction[T, (K, V)], ek: Encoder[K],
                          ev: Encoder[V]): JavaPairProvDataset[K, V] = {
    val e = Encoders.tuple(ek, ev)
    new JavaPairProvDataset(
      rdd.flatMap(t => f.call(t).asScala, "flatMapToPair")(recEnc(e)), ek, ev)
  }

  /** Pair flatMap with caller-built provenance records — the analogue of the
    * reference's `PairFlatMapFunctionWithDataElementAndTask` entry point
    * (see [[graft.prov.javaapi.function.PairFlatMapFunctionWithProvRecordAndTask]]).
    * The returned records are used verbatim: the caller picks each output's
    * id (`ProvIds.newId()`) and dependency list, typically from the input
    * record's `id()`/`deps()`.
    */
  def flatMapToPairWithProvRecordAndTask[K, V](
      f: PairFlatMapFunctionWithProvRecordAndTask[T, K, V],
      ek: Encoder[K], ev: Encoder[V]): JavaPairProvDataset[K, V] = {
    val t = rdd.session.newTask(TransformationType.FLAT_MAP,
      Seq(rdd.task.id), "flatMapToPairWithProvRecordAndTask")
    t.schemaFields = DefaultSchemas.pairFieldNames
    val tid = t.id
    val e = JavaEncoders.provRecord(Encoders.tuple(ek, ev))
    val out = rdd.ds.flatMap(r => f.call(r, tid).asScala)(e)
    new JavaPairProvDataset(ProvDataset.create(out, t, rdd.session), ek, ev)
  }

  // ---- set / multi-input ops ------------------------------------------

  def union(other: JavaProvDataset[T]): JavaProvDataset[T] =
    new JavaProvDataset(rdd.union(other.rdd), encoder)

  def intersection(other: JavaProvDataset[T]): JavaProvDataset[T] =
    new JavaProvDataset(rdd.intersection(other.rdd)(encoder), encoder)

  def subtract(other: JavaProvDataset[T]): JavaProvDataset[T] =
    new JavaProvDataset(rdd.subtract(other.rdd)(encoder), encoder)

  def distinct(): JavaProvDataset[T] =
    new JavaProvDataset(rdd.distinct()(encoder), encoder)

  def cartesian[U](other: JavaProvDataset[U]): JavaPairProvDataset[T, U] = {
    val e = Encoders.tuple(encoder, other.encoder)
    new JavaPairProvDataset(rdd.cartesian(other.rdd)(recEnc(e)),
      encoder, other.encoder)
  }

  def zip[U](other: JavaProvDataset[U]): JavaPairProvDataset[T, U] = {
    val e = Encoders.tuple(encoder, other.encoder)
    new JavaPairProvDataset(rdd.zip(other.rdd)(recEnc(e)),
      encoder, other.encoder)
  }

  def zipWithIndex(): JavaPairProvDataset[T, jl.Long] = {
    val e = Encoders.tuple(encoder, Encoders.scalaLong)
    val zipped = rdd.zipWithIndex()(recEnc(e))
      .asInstanceOf[ProvDataset[(T, jl.Long)]]
    new JavaPairProvDataset(zipped, encoder, Encoders.LONG)
  }

  def zipWithUniqueId(): JavaPairProvDataset[T, jl.Long] = {
    val e = Encoders.tuple(encoder, Encoders.scalaLong)
    val zipped = rdd.zipWithUniqueId()(recEnc(e))
      .asInstanceOf[ProvDataset[(T, jl.Long)]]
    new JavaPairProvDataset(zipped, encoder, Encoders.LONG)
  }

  // ---- partitioning / ordering ----------------------------------------

  def persist(): JavaProvDataset[T] = { rdd.persist(); this }
  def cache(): JavaProvDataset[T] = { rdd.cache(); this }
  def unpersist(): JavaProvDataset[T] = { rdd.unpersist(); this }
  def repartition(n: Int): JavaProvDataset[T] =
    new JavaProvDataset(rdd.repartition(n), encoder)
  def coalesce(n: Int): JavaProvDataset[T] =
    new JavaProvDataset(rdd.coalesce(n), encoder)

  /** `comp` must also implement `java.io.Serializable` (it ships inside the
    * sort closure) — a lambda cast `(Comparator&lt;S&gt; &amp; Serializable)` works.
    */
  def sortBy[S](f: MapFunction[T, S], ascending: Boolean,
                comp: ju.Comparator[S]): JavaProvDataset[T] = {
    implicit val ord: Ordering[S] = Ordering.comparatorToOrdering(comp)
    implicit val ct: ClassTag[S] = anyTag
    new JavaProvDataset(rdd.sortBy(t => f.call(t), ascending), encoder)
  }

  def sample(fraction: Double, seed: Long): JavaProvDataset[T] =
    new JavaProvDataset(rdd.sample(fraction, seed), encoder)

  // ---- actions ----------------------------------------------------------

  def collect(): ju.List[T] = rdd.collect().asJava
  def collectWithProv(): ju.List[ProvRecord[T]] = rdd.collectWithProv().asJava
  def count(): Long = rdd.count()
  def take(n: Int): ju.List[T] = rdd.take(n).asJava
  def first(): T = rdd.first()
  def isEmpty: Boolean = rdd.isEmpty
  def toLocalIterator(): ju.Iterator[T] = rdd.toLocalIterator().asJava

  def reduce(f: ReduceFunction[T]): T = rdd.reduce((a, b) => f.call(a, b))

  def foreach(f: ForeachFunction[T]): Unit = rdd.foreach(t => f.call(t))

  /** Action over full provenance records (reference:
    * JavaRDDLike.scala:731 `foreachAsyncWithDataElement`).
    */
  def foreachWithDataElement(f: ForeachFunction[ProvRecord[T]]): Unit =
    rdd.foreachWithDataElement(r => f.call(r))

  def countByValue(): ju.Map[T, jl.Long] = {
    implicit val e: Encoder[T] = encoder
    rdd.countByValue().map { case (k, v) => k -> jl.Long.valueOf(v) }.asJava
  }

  def saveAsTextFile(path: String): Unit = rdd.saveAsTextFile(path)
  def saveAsObjectFile(path: String): Unit = rdd.saveAsObjectFile(path)

  /** Plain values as a stock typed Dataset (leaves provenance tracking). */
  def values(): Dataset[T] = rdd.values(encoder)
}
