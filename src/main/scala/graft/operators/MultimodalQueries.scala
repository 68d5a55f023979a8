package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/featurized in batched per-partition passes.
  *
  * mm02's decode is REAL: executors encode deterministic images to PNG
  * bytes with `javax.imageio` (JDK-only, headless-safe), then decode
  * those opaque binary payloads back and extract width/height/
  * per-channel pixel means from the DECODED pixels. The oracle
  * recomputes the expected stats independently from the generation
  * formula — a broken encode or decode fails the hash gate. mm03's
  * frame FEATURES remain synthetic (video codecs aren't in the JDK),
  * with the explode/rollup plumbing real and gated.
  */
object MultimodalQueries {

  /** Deterministic test image for `media_id`: W×H TYPE_INT_RGB with
    * channel values r=(id+3x+5y)%256, g=(2id+7x+11y)%256,
    * b=(3id+13x+17y)%256 — closed-form, so expected decode stats are
    * recomputable in pure SQL. Stands in for reading a binary media
    * column from storage; everything downstream treats the bytes as
    * opaque.
    */
  private[operators] def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 7) % 24).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + 3L * x + 5L * y) % 256).toInt
        val g = ((2L * id + 7L * x + 11L * y) % 256).toInt
        val b = ((3L * id + 13L * x + 17L * y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

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

  /** Batched decode + featurize with a REAL codec: stage 1 materializes
    * opaque PNG payloads as a binary column (see [[syntheticPng]] — the
    * stand-in for a binary media column read from storage); stage 2
    * `mapPartitions` over (id, payload) batches — the same batch shape a
    * mapInPandas decode uses — runs `javax.imageio.ImageIO.read` on each
    * payload and extracts width/height/per-channel means from the
    * decoded pixel grid. PNG is lossless and the generator is
    * closed-form, so the oracle recomputes every expected value from the
    * formula alone: any encode/decode defect breaks the hash match.
    * Sums are exact integers (≤ 31×31×255 < 2^53), so DOUBLE division
    * is bit-identical across engines — no rounding tricks needed.
    */
  val mm02DecodeFeatures = QueryDef(
    "mm02_decode_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, syntheticPng(id))))
        .toDF("media_id", "payload")
        .as[(Long, Array[Byte])]
      media.mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF
              sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w * h).toDouble
          (id, w, h, sr / n, sg / n, sb / n)
        }
      }.toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .orderBy(col("media_id"))
    },
    // independent recomputation from the generation formula — never from
    // the payload bytes the Spark side decodes
    Some("""WITH base AS (
           |  SELECT doc_id AS media_id,
           |         8 + (doc_id % 24) AS w,
           |         8 + ((doc_id * 7) % 24) AS h
           |  FROM documents),
           |px AS (
           |  SELECT media_id, w, h,
           |         (media_id + 3 * x + 5 * y) % 256 AS r,
           |         (2 * media_id + 7 * x + 11 * y) % 256 AS g,
           |         (3 * media_id + 13 * x + 17 * y) % 256 AS b
           |  FROM base,
           |       LATERAL unnest(generate_series(0, w - 1)) AS tx(x),
           |       LATERAL unnest(generate_series(0, h - 1)) AS ty(y))
           |SELECT media_id, CAST(max(w) AS INT) AS width,
           |       CAST(max(h) AS INT) AS height,
           |       CAST(sum(r) AS DOUBLE) / (max(w) * max(h)) AS mean_r,
           |       CAST(sum(g) AS DOUBLE) / (max(w) * max(h)) AS mean_g,
           |       CAST(sum(b) AS DOUBLE) / (max(w) * max(h)) AS mean_b
           |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin))

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

  /** Deterministic 16-bit PCM mono WAV for `media_id`: n samples of the
    * integer waveform s(k) = ((id·31 + k·17) mod 2001) − 1000 at 8 kHz,
    * packaged through the JDK's real WAV writer. Closed-form, so
    * expected decode stats are recomputable in pure SQL.
    */
  private[operators] def syntheticWav(id: Long): Array[Byte] = {
    val n = (400 + (id % 100) * 4).toInt
    val pcm = new Array[Byte](n * 2)
    var k = 0
    while (k < n) {
      val s = (((id * 31 + k * 17) % 2001) - 1000).toInt
      pcm(2 * k) = (s & 0xFF).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Audio decode + featurize with a REAL codec (`javax.sound.sampled`,
    * JDK-only): WAV payloads are parsed back through
    * `AudioSystem.getAudioInputStream` — container header, format, and
    * sample stream all come from the DECODER — and per-clip stats
    * (sample count, rate, mean amplitude, peak) are computed from the
    * decoded samples. The oracle recomputes everything from the
    * waveform formula; integer sums are exact, so the DOUBLE mean is
    * bit-identical across engines. The audio mirror of [[mm02DecodeFeatures]].
    */
  val mm04AudioFeatures = QueryDef(
    "mm04_audio_features",
    (s, d) => {
      val spark = s
      import spark.implicits._
      val media = Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, syntheticWav(id))))
        .toDF("media_id", "payload")
        .as[(Long, Array[Byte])]
      media.mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unexpected decoded format: $fmt")
          val bytes = ais.readAllBytes()
          ais.close()
          val n = bytes.length / 2
          var sum = 0L
          var peak = 0L
          var k = 0
          while (k < n) {
            val v = (((bytes(2 * k + 1) & 0xFF) << 8) |
              (bytes(2 * k) & 0xFF)).toShort.toLong
            sum += v
            val a = math.abs(v)
            if (a > peak) peak = a
            k += 1
          }
          (id, n.toLong, fmt.getSampleRate.toInt, sum.toDouble / n, peak)
        }
      }.toDF("media_id", "n_samples", "sample_rate", "mean_amp", "peak")
        .orderBy(col("media_id"))
    },
    Some("""WITH base AS (
           |  SELECT doc_id AS media_id, 400 + (doc_id % 100) * 4 AS n
           |  FROM documents),
           |smp AS (
           |  SELECT media_id, n,
           |         ((media_id * 31 + k * 17) % 2001) - 1000 AS s
           |  FROM base, LATERAL unnest(generate_series(0, n - 1)) AS t(k))
           |SELECT media_id, CAST(max(n) AS BIGINT) AS n_samples,
           |       CAST(8000 AS INT) AS sample_rate,
           |       CAST(sum(s) AS DOUBLE) / max(n) AS mean_amp,
           |       CAST(max(abs(s)) AS BIGINT) AS peak
           |FROM smp GROUP BY media_id ORDER BY media_id""".stripMargin))

  def all: Seq[QueryDef] = Seq(mm01MediaTable, mm02DecodeFeatures,
    mm03FrameSample, mm04AudioFeatures)
}
