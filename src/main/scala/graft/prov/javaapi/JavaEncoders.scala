package graft.prov.javaapi

import scala.reflect.ClassTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders._
import org.apache.spark.sql.types.Metadata

import graft.prov.ProvRecord

/** Encoder composition for the Java API.
  *
  * Scala callers get `Encoder[ProvRecord[T]]` from `spark.implicits._`
  * (TypeTag derivation); Java callers only hold an `Encoder&lt;T&gt;` from
  * `Encoders.STRING()` / `Encoders.bean(...)` / `Encoders.tuple(...)`.
  * These helpers lift a value encoder into the wrapper shapes the
  * provenance layer needs — built from Spark's agnostic-encoder algebra,
  * so the result is a first-class Catalyst product encoder (columnar,
  * codegen-friendly), NOT kryo/java serialization.
  */
object JavaEncoders {

  /** The [[AgnosticEncoder]] behind any public `Encoder` (Spark 4 encoders
    * are agnostic encoders, possibly wrapped in an `ExpressionEncoder`).
    */
  private def agnostic[T](e: Encoder[T]): AgnosticEncoder[T] = e match {
    case a: AgnosticEncoder[T @unchecked] => a
    case x: ExpressionEncoder[T @unchecked] => x.encoder
    case other =>
      throw new IllegalArgumentException(
        s"unsupported Encoder implementation: ${other.getClass.getName}")
  }

  private val stringSeqEnc: AgnosticEncoder[Seq[String]] =
    IterableEncoder(
      ClassTag(classOf[Seq[String]]).asInstanceOf[ClassTag[Seq[String]]],
      StringEncoder, containsNull = false, lenientSerialization = false)

  /** `Encoder[ProvRecord[T]]` from the value's encoder: a product encoder
    * over (id: String, deps: Seq[String], value: T).
    */
  def provRecord[T](value: Encoder[T]): Encoder[ProvRecord[T]] = {
    val v = agnostic(value)
    ProductEncoder[ProvRecord[T]](
      ClassTag(classOf[ProvRecord[T]]).asInstanceOf[ClassTag[ProvRecord[T]]],
      Seq(
        EncoderField("id", StringEncoder, nullable = false, Metadata.empty),
        EncoderField("deps", stringSeqEnc, nullable = false, Metadata.empty),
        EncoderField("value", v, v.nullable, Metadata.empty)),
      None)
  }

  /** `Encoder[Option[T]]` — outer-join wrappers. */
  def option[T](value: Encoder[T]): Encoder[Option[T]] =
    OptionEncoder(agnostic(value))

  /** `Encoder[Seq[T]]` — groupByKey / glom results. */
  def seq[T](value: Encoder[T]): Encoder[Seq[T]] =
    IterableEncoder(
      ClassTag(classOf[Seq[T]]).asInstanceOf[ClassTag[Seq[T]]],
      agnostic(value), containsNull = false, lenientSerialization = false)

  /** Buffer encoder for the keyed-aggregation family:
    * (Option[C], Seq[String]) — user combiner + accumulated deps.
    */
  private[javaapi] def aggBuffer[C](c: Encoder[C]): Encoder[(Option[C], Seq[String])] =
    ProductEncoder[(Option[C], Seq[String])](
      ClassTag(classOf[(Option[C], Seq[String])])
        .asInstanceOf[ClassTag[(Option[C], Seq[String])]],
      Seq(
        EncoderField("_1", OptionEncoder(agnostic(c)), nullable = true, Metadata.empty),
        EncoderField("_2", stringSeqEnc, nullable = false, Metadata.empty)),
      None)
}
