package graft.prov.javaapi

import _root_.java.{lang => jl, util => ju}

import scala.jdk.CollectionConverters._
import scala.reflect.ClassTag

import org.apache.spark.api.java.function.{FlatMapFunction, Function => JFunction, Function2 => JFunction2, MapFunction, ReduceFunction}
import org.apache.spark.sql.{Encoder, Encoders}

import graft.prov._
import graft.prov.ProvDataset.ProvPairOps

/** Java-friendly view of the pair-operation surface — the analogue of the
  * reference's `JavaPairRDD` (core/src/main/scala/org/apache/spark/api/java/
  * JavaPairRDD.scala). Delegates to [[graft.prov.ProvDataset.ProvPairOps]],
  * so the keyed-aggregation lineage (buffer = combiner + accumulated deps,
  * map-side combined) and the joinWith-based join family behave exactly as
  * the Scala surface. Outer-join wrappers keep `scala.Option` and grouped
  * values keep `scala.collection.immutable.Seq` — converting would insert an
  * extra provenance task; use `Option.getOrElse` /
  * `scala.jdk.javaapi.CollectionConverters.asJava` at the consumption site.
  */
final class JavaPairProvDataset[K, V] private[javaapi] (
    val rdd: ProvDataset[(K, V)], val kEncoder: Encoder[K],
    val vEncoder: Encoder[V]) {

  private def ops = new ProvPairOps(rdd)
  private def anyTag[A]: ClassTag[A] = ClassTag.AnyRef.asInstanceOf[ClassTag[A]]
  private def pairDs(ek: Encoder[K], ev: Encoder[V]) =
    new JavaProvDataset(rdd, Encoders.tuple(ek, ev))

  def scalaProv: ProvDataset[(K, V)] = rdd
  def taskId: String = rdd.taskId

  /** The plain-dataset surface over the same pairs (map/filter/union/...). */
  def toJavaProvDataset: JavaProvDataset[(K, V)] = pairDs(kEncoder, vEncoder)

  def setName(name: String): JavaPairProvDataset[K, V] = { rdd.setName(name); this }
  def ignoreIt(): JavaPairProvDataset[K, V] = { rdd.ignoreIt(); this }

  // ---- keyed aggregation (SURVEY §2.6) --------------------------------

  private def wrapKV[W](out: ProvDataset[(K, W)],
                        ew: Encoder[W]): JavaPairProvDataset[K, W] =
    new JavaPairProvDataset(out, kEncoder, ew)

  def reduceByKey(f: ReduceFunction[V]): JavaPairProvDataset[K, V] =
    wrapKV(ops.reduceByKey((a, b) => f.call(a, b))(
      kEncoder, JavaEncoders.aggBuffer(vEncoder),
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, vEncoder))), vEncoder)

  def foldByKey(zero: V, f: ReduceFunction[V]): JavaPairProvDataset[K, V] =
    wrapKV(ops.foldByKey(zero)((a, b) => f.call(a, b))(
      kEncoder, JavaEncoders.aggBuffer(vEncoder),
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, vEncoder))), vEncoder)

  def aggregateByKey[C](zero: C, seqOp: JFunction2[C, V, C],
                        combOp: JFunction2[C, C, C],
                        ec: Encoder[C]): JavaPairProvDataset[K, C] =
    wrapKV(ops.aggregateByKey(zero)((c, v) => seqOp.call(c, v),
      (a, b) => combOp.call(a, b))(
      kEncoder, JavaEncoders.aggBuffer(ec),
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, ec))), ec)

  def combineByKey[C](createCombiner: JFunction[V, C],
                      mergeValue: JFunction2[C, V, C],
                      mergeCombiners: JFunction2[C, C, C],
                      ec: Encoder[C]): JavaPairProvDataset[K, C] =
    wrapKV(ops.combineByKey(v => createCombiner.call(v),
      (c, v) => mergeValue.call(c, v), (a, b) => mergeCombiners.call(a, b))(
      kEncoder, JavaEncoders.aggBuffer(ec),
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, ec))), ec)

  def groupByKey(): JavaPairProvDataset[K, Seq[V]] = {
    val esv = JavaEncoders.seq(vEncoder)
    wrapKV(ops.groupByKey()(
      kEncoder, JavaEncoders.aggBuffer(esv),
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, esv))), esv)
  }

  // ---- value-side transforms ------------------------------------------

  def mapValues[W](f: MapFunction[V, W], ew: Encoder[W]): JavaPairProvDataset[K, W] =
    wrapKV(ops.mapValues(v => f.call(v))(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, ew))), ew)

  def flatMapValues[W](f: FlatMapFunction[V, W],
                       ew: Encoder[W]): JavaPairProvDataset[K, W] =
    wrapKV(ops.flatMapValues(v => f.call(v).asScala)(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, ew))), ew)

  def keys(): JavaProvDataset[K] =
    new JavaProvDataset(ops.keys(JavaEncoders.provRecord(kEncoder)), kEncoder)

  def values(): JavaProvDataset[V] =
    new JavaProvDataset(ops.valuesDs(JavaEncoders.provRecord(vEncoder)), vEncoder)

  // ---- joins (SURVEY §2.5) ---------------------------------------------

  def join[W](other: JavaPairProvDataset[K, W]): JavaPairProvDataset[K, (V, W)] = {
    val evw = Encoders.tuple(vEncoder, other.vEncoder)
    wrapKV(ops.join(other.rdd)(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, evw))), evw)
  }

  def leftOuterJoin[W](other: JavaPairProvDataset[K, W])
      : JavaPairProvDataset[K, (V, Option[W])] = {
    val evw = Encoders.tuple(vEncoder, JavaEncoders.option(other.vEncoder))
    wrapKV(ops.leftOuterJoin(other.rdd)(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, evw))), evw)
  }

  def rightOuterJoin[W](other: JavaPairProvDataset[K, W])
      : JavaPairProvDataset[K, (Option[V], W)] = {
    val evw = Encoders.tuple(JavaEncoders.option(vEncoder), other.vEncoder)
    wrapKV(ops.rightOuterJoin(other.rdd)(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, evw))), evw)
  }

  def fullOuterJoin[W](other: JavaPairProvDataset[K, W])
      : JavaPairProvDataset[K, (Option[V], Option[W])] = {
    val evw = Encoders.tuple(JavaEncoders.option(vEncoder),
      JavaEncoders.option(other.vEncoder))
    wrapKV(ops.fullOuterJoin(other.rdd)(
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, evw))), evw)
  }

  def cogroup[W](other: JavaPairProvDataset[K, W])
      : JavaPairProvDataset[K, (Seq[V], Seq[W])] = {
    val evw = Encoders.tuple(JavaEncoders.seq(vEncoder),
      JavaEncoders.seq(other.vEncoder))
    wrapKV(ops.cogroup(other.rdd)(kEncoder,
      JavaEncoders.provRecord(Encoders.tuple(kEncoder, evw))), evw)
  }

  def subtractByKey[W](other: JavaPairProvDataset[K, W]): JavaPairProvDataset[K, V] =
    wrapKV(ops.subtractByKey(other.rdd)(kEncoder), vEncoder)

  // ---- partitioning / ordering ------------------------------------------

  def partitionByKey(n: Int): JavaPairProvDataset[K, V] =
    wrapKV(ops.partitionByKey(n), vEncoder)

  /** `comp` must also implement `java.io.Serializable` (it ships inside the
    * sort closure) — a lambda cast `(Comparator&lt;K&gt; &amp; Serializable)` works.
    */
  def sortByKey(ascending: Boolean, comp: ju.Comparator[K]): JavaPairProvDataset[K, V] = {
    implicit val ord: Ordering[K] = Ordering.comparatorToOrdering(comp)
    implicit val ct: ClassTag[K] = anyTag
    wrapKV(ops.sortByKey(ascending), vEncoder)
  }

  // ---- actions -------------------------------------------------------------

  def collect(): ju.List[(K, V)] = rdd.collect().asJava
  def count(): Long = rdd.count()

  def countByKey(): ju.Map[K, jl.Long] =
    ops.countByKey()(kEncoder).map { case (k, n) => k -> jl.Long.valueOf(n) }.asJava

  def collectAsMap(): ju.Map[K, V] = ops.collectAsMap().asJava

  def reduceByKeyLocally(f: ReduceFunction[V]): ju.Map[K, V] =
    ops.reduceByKeyLocally((a, b) => f.call(a, b)).asJava

  def lookup(key: K): ju.List[V] = ops.lookup(key).asJava
}
