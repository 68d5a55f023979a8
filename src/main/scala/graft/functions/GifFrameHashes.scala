package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** SQL surface for the mm09 video decode+hash kernel: decode an opaque
  * GIF payload with the real JDK sequence reader and emit one 64-bit
  * gray aHash per frame —
  * `SELECT media_id, f.* FROM media, LATERAL explode(gif_frame_hashes(payload)) t(f)`
  * is the whole mm09 hashing stage in pure SQL, and composing it with
  * the registered `phash_bands` makes the video near-dup pipeline
  * SQL-expressible end to end (the gap the round-9 registration audit
  * named). Delegates to the EXACT gated kernel
  * ([[graft.operators.MultimodalQueries.videoFrameHashesOf]] — shared
  * code with the batch facade and the at-ingest stream screen), so SQL
  * callers hash identically by construction.
  *
  * CodegenFallback deliberately: the per-row cost is the ImageIO
  * decode itself — JVM codec code no expression codegen can inline —
  * so falling out of WholeStageCodegen costs nothing measurable here
  * (unlike a hot arithmetic expression, where a fallback would break
  * the codegen span for real).
  */
case class GifFrameHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gif_frame_hashes expects a BINARY payload, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_no", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "gif_frame_hashes"

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    val rows = graft.operators.MultimodalQueries.videoFrameHashesOf(payload)
    new GenericArrayData(rows.map { case (f, k, lo, hi) =>
      InternalRow(f, k, lo, hi): Any
    }.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
