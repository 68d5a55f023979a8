package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/featurized in batched per-partition passes.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below): it derives a fake
  * width/height/feature vector from the payload bytes. Everything
  * Spark-side — schema (binary + metadata struct), partition-batched
  * processing shape, feature-vector output schema — is real and tested;
  * swapping the stub for a real codec is a one-function change.
  */
object MultimodalQueries {

  /** Build the media table: payload BINARY + STRUCT<format,n_bytes>
    * metadata (documents' text bytes stand in for image payloads).
    */
  val mm01MediaTable = QueryDef(
    "mm01_media_table",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "UTF-8").as("payload"),
          struct(lit("fake/png").as("format"),
                 length(col("text")).cast("long").as("n_bytes")).as("meta"))
        .select(col("media_id"), length(col("payload")).cast("long").as("payload_len"),
          col("meta.format").as("format"), col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
           |  octet_length(encode(text)) AS payload_len,
           |  'fake/png' AS format, length(text) AS n_bytes
           |FROM documents ORDER BY media_id""".stripMargin))

  /** Batched "decode + featurize": mapPartitions over (id, payload) rows
    * — the same batch shape a Pandas-UDF/mapInPandas decode uses. The
    * per-record decode below is the STUB (deterministic pseudo-decode
    * from payload bytes: ??? → replaced by a real codec in production).
    * Because the payloads are ASCII (byte value = code point), the stub
    * arithmetic is mirrored exactly in DuckDB SQL — so even the stubbed
    * pipeline is oracle-gated end to end, not just rows-checked.
    */
  val mm02DecodeFeatures = QueryDef(
    "mm02_decode_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
      media.mapPartitions { batch =>
        // STUB decode: a real implementation decodes the image and
        // extracts features; here width/height/features derive
        // deterministically from the payload so the pipeline is testable.
        batch.map { case (id, payload) =>
          val width = 1 + (math.abs(payload.length * 31) % 512)
          val height = 1 + (math.abs(payload.map(_.toInt).sum) % 512)
          val features = (0 until 8).map { i =>
            val slice = payload.drop(i * (payload.length / 8 max 1))
              .take(payload.length / 8 max 1)
            if (slice.isEmpty) 0.0
            else math.round(slice.map(_.toDouble).sum / slice.length * 100) / 100.0
          }
          (id, width, height, features)
        }
      }.toDF("media_id", "width", "height", "features")
        .select(col("media_id"), col("width"), col("height"),
          round(expr("aggregate(features, 0D, (a, x) -> a + x)"), 2).as("feature_sum"))
        .orderBy(col("media_id"))
    },
    // the stub decode, re-expressed over code points (payload is ASCII):
    // width = 1+(L*31 % 512); height = 1+(Σbyte % 512); 8 equal slices of
    // size max(L/8,1), per-slice round(avg*100)/100, summed and rounded
    Some("""WITH base AS (
           |  SELECT doc_id AS media_id, text, length(text) AS L,
           |         greatest(length(text) // 8, 1) AS s
           |  FROM documents),
           |chars AS (
           |  SELECT media_id, s, L, i, unicode(substr(text, i, 1)) AS cp
           |  FROM base, LATERAL unnest(generate_series(1, L)) AS t(i)),
           |slice_avgs AS (
           |  SELECT media_id, ((i - 1) // s) AS slice,
           |         round(avg(cp) * 100) / 100 AS slice_avg
           |  FROM chars WHERE ((i - 1) // s) < 8
           |  GROUP BY media_id, ((i - 1) // s)),
           |feats AS (
           |  SELECT media_id, round(sum(slice_avg), 2) AS feature_sum
           |  FROM slice_avgs GROUP BY media_id),
           |hw AS (
           |  SELECT media_id, 1 + ((max(L) * 31) % 512) AS width,
           |         CAST(1 + (sum(cp) % 512) AS BIGINT) AS height
           |  FROM chars GROUP BY media_id)
           |SELECT f.media_id, hw.width, hw.height, f.feature_sum
           |FROM feats f JOIN hw ON f.media_id = hw.media_id
           |ORDER BY f.media_id""".stripMargin))

  /** Frame-sampling shape: explode K deterministic "frames" per media row
    * then aggregate per-frame stub features — the plumbing for video
    * frame extraction (partitioning: frames stay co-located with their
    * media row; no shuffle until the final rollup).
    */
  val mm03FrameSample = QueryDef(
    "mm03_frame_sample",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), col("n_chars"),
          explode(sequence(lit(0), lit(3))).as("frame_no"))
        // STUB frame feature: real impl decodes frame frame_no
        .withColumn("frame_feature",
          round((col("n_chars") * (col("frame_no") + 1)) % 997, 0))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          round(avg(col("frame_feature")), 2).as("avg_frame_feature"))
        .orderBy(col("media_id"))
    },
    Some("""WITH frames AS (
           |  SELECT doc_id AS media_id, n_chars, unnest(generate_series(0, 3)) AS frame_no
           |  FROM documents)
           |SELECT media_id, count(*) AS n_frames,
           |  round(avg((n_chars * (frame_no + 1)) % 997), 2) AS avg_frame_feature
           |FROM frames GROUP BY media_id ORDER BY media_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(mm01MediaTable, mm02DecodeFeatures, mm03FrameSample)
}
