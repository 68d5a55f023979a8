package graft.prov.javaapi

import _root_.java.{lang => jl, util => ju}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}

import graft.prov._

/** Java-friendly view of [[graft.prov.ProvSession]] — the session half of
  * the reference's Java mirror (`JavaSparkContext` in
  * core/src/main/scala/org/apache/spark/api/java/JavaSparkContext.scala).
  * Sources take an explicit `Encoder` for the element type; everything else
  * delegates to the Scala session, so execution ids, flush semantics, and
  * the provenance store layout are identical across the two surfaces.
  */
final class JavaProvSession private (val session: ProvSession) {

  def spark: SparkSession = session.spark
  def executionId: String = session.executionId

  def parallelize[T](data: ju.List[T], e: Encoder[T]): JavaProvDataset[T] =
    new JavaProvDataset(
      session.parallelize(data.asScala.toSeq)(e, JavaEncoders.provRecord(e)), e)

  def range(n: Long): JavaProvDataset[jl.Long] = {
    val ds = session.range(n)(JavaEncoders.provRecord(Encoders.scalaLong))
      .asInstanceOf[ProvDataset[jl.Long]]
    new JavaProvDataset(ds, Encoders.LONG)
  }

  def textFile(path: String): JavaProvDataset[String] =
    new JavaProvDataset(session.textFile(path), Encoders.STRING)

  def objectFile[T](path: String, e: Encoder[T]): JavaProvDataset[T] =
    new JavaProvDataset(
      session.objectFile(path)(JavaEncoders.provRecord(e)), e)

  def binaryRecords(path: String, recordLength: Int): JavaProvDataset[Array[Byte]] =
    new JavaProvDataset(
      session.binaryRecords(path, recordLength)(
        JavaEncoders.provRecord(Encoders.BINARY)), Encoders.BINARY)

  def newTransformationGroup(name: String): GroupState = session.newGroup(name)

  def queries(storeDir: String): ProvenanceQueries =
    new ProvenanceQueries(session.spark, storeDir)

  def allTasks: ju.List[TaskState] = session.allTasks.asJava

  def flush(): Unit = session.flush()
  def awaitFlushes(): Unit = session.awaitFlushes()
  def close(): Unit = session.close()
}

object JavaProvSession {
  /** Open a provenance session — mirror of `ProvSession.create` with the
    * Java-reachable subset of its options.
    */
  def create(spark: SparkSession, appName: String,
             storeDir: String): JavaProvSession =
    new JavaProvSession(ProvSession.create(spark, appName, storeDir))

  def create(spark: SparkSession, appName: String, storeDir: String,
             captureEnabled: Boolean, captureDropped: Boolean,
             asyncFlush: Boolean): JavaProvSession =
    new JavaProvSession(ProvSession.create(spark, appName, storeDir,
      captureEnabled = captureEnabled, captureDropped = captureDropped,
      asyncFlush = asyncFlush))

  /** Wrap an existing Scala session (shared pipelines across languages). */
  def wrap(session: ProvSession): JavaProvSession = new JavaProvSession(session)
}
