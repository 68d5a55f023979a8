package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Durable on-disk layout for the built vector/sketch indexes — the
  * persistence layer that completes the build → persist → serve →
  * append → drift lifecycle (before this, every
  * [[graft.api.Graft.pqIndex]] call re-trained: the append/drift
  * contracts existed but the artifacts they freeze died with the JVM).
  *
  * Layout under `dir` (all parquet — no side formats, so the store
  * reads/writes with nothing but the Spark session it is given):
  *
  *   - `manifest/`  — ONE row: (kind, version, m_bits). `kind` is
  *     checked on load, so opening a PQ directory as an IVF index
  *     fails loudly instead of mis-shaping frames.
  *   - `assigned/` or `codes/` — the big table, PARTITIONED BY `cell`
  *     for the IVF families: a saved IVF index is directly servable by
  *     [[graft.streaming.EmbStreams.ivfServePruned]] (its per-batch
  *     `cell isin probed` partition filter prunes at the FILE level),
  *     and a probe-time scan reads only the probed cells' directories.
  *     The PQ code table is unpartitioned (ADC scans all codes by
  *     design — 4 bytes/vector is the whole point).
  *   - `centroids/` — the tiny coarse table (IVF families).
  *   - `codebooks/` — (mi, ci, vals) rows, reassembled driver-side
  *     into the `Array[Array[Array[Double]]]` the ADC kernels take
  *     (PQ families). Doubles round-trip parquet exactly, so a loaded
  *     index scores BIT-FOR-BIT like the freshly trained one
  *     (IndexStoreSpec proves it).
  *   - `corpus/` — (vec_id, embedding) raw vectors (PQ only — the
  *     [[graft.api.Graft.PqIndex.rerank]] fetch side; production
  *     stores keep these on cold storage next to the hot codes).
  *
  * Writes use overwrite semantics per sub-path (re-saving an appended
  * index over its own directory is the normal refresh cycle). All
  * values round-trip exactly: Long/Int ids, float arrays, double
  * codebooks — parquet is lossless for every stored type, which is
  * what makes the save → load → search ≡ fresh-build → search
  * contract provable rather than approximate.
  *
  * Scale: the only driver-side materialization on load is the
  * codebook table (m × k rows) and the one-row manifest; `assigned`/
  * `codes`/`corpus` stay distributed frames. At 100 TB the save is
  * one partitioned write of data that already exists; the load is
  * metadata-only until an action runs.
  */
object IndexStore {

  /** Bumped only on layout changes; checked on load. */
  val Version = 1

  final case class Manifest(kind: String, version: Int, m_bits: Long)

  private def writeManifest(spark: SparkSession, dir: String, kind: String,
                            mBits: Long = 0L): Unit = {
    import spark.implicits._
    Seq(Manifest(kind, Version, mBits)).toDF()
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
  }

  /** Read + validate the manifest: wrong `kind` or unknown `version`
    * fails loudly with the path in the message.
    */
  private def readManifest(spark: SparkSession, dir: String,
                           expectKind: String): Manifest = {
    val r = spark.read.parquet(s"$dir/manifest").collect() match {
      case Array(row) => Manifest(row.getAs[String]("kind"),
        row.getAs[Int]("version"), row.getAs[Long]("m_bits"))
      case rows => throw new IllegalStateException(
        s"$dir/manifest: expected exactly 1 row, found ${rows.length}")
    }
    require(r.kind == expectKind,
      s"$dir holds a '${r.kind}' index, not the requested '$expectKind'")
    require(r.version == Version,
      s"$dir was written by layout version ${r.version}; this build reads $Version")
    r
  }

  private def writeCodebooks(spark: SparkSession, dir: String,
                             cbs: Array[Array[Array[Double]]]): Unit = {
    import spark.implicits._
    val rows = for {
      mi <- cbs.indices
      ci <- cbs(mi).indices
    } yield (mi, ci, cbs(mi)(ci).toSeq)
    rows.toDF("mi", "ci", "vals")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
  }

  private def readCodebooks(spark: SparkSession, dir: String)
      : Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("mi"), col("ci"), col("vals")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val cbs = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      cbs(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    cbs.map(_.toArray)
  }

  // ------------------------------------------------------------------
  // IVF
  // ------------------------------------------------------------------

  def saveIvf(dir: String, assigned: DataFrame,
              centroids: DataFrame): Unit = {
    val spark = assigned.sparkSession
    assigned.select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/assigned")
    centroids.select(col("cell"), col("centroid"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    writeManifest(spark, dir, "ivf")
  }

  /** DURABLE append — write already-assigned arrival rows (vec_id,
    * embedding, cell) INTO the saved cell-partitioned layout. The
    * stored rows are never rewritten: this is a parquet append that
    * adds files to (only) the touched cells' directories, so append
    * cost is one partitioned write of the arrivals and a restarted
    * JVM's [[loadIvf]] sees the union. Kind-checked first, so an
    * arrival batch cannot land in a PQ directory.
    */
  def appendIvf(dir: String, assignedArrivals: DataFrame): Unit = {
    readManifest(assignedArrivals.sparkSession, dir, "ivf")
    assignedArrivals.select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode(SaveMode.Append)
      .partitionBy("cell").parquet(s"$dir/assigned")
  }

  /** (assigned, centroids) — column order and types normalized back to
    * the build-time shape (a hive partition column reads back at the
    * end of the schema; `select` + cast restores the contract).
    */
  def loadIvf(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    readManifest(spark, dir, "ivf")
    val assigned = spark.read.parquet(s"$dir/assigned")
      .select(col("vec_id"), col("embedding"), col("cell").cast("int"))
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid"))
    (assigned, centroids)
  }

  // ------------------------------------------------------------------
  // PQ
  // ------------------------------------------------------------------

  def savePq(dir: String, codes: DataFrame,
             codebooks: Array[Array[Array[Double]]],
             corpus: DataFrame): Unit = {
    val spark = codes.sparkSession
    val m = codebooks.length
    codes.select(col("vec_id") +: (0 until m).map(mi => col(s"code_$mi")): _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
    corpus.select(col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/corpus")
    writeCodebooks(spark, dir, codebooks)
    writeManifest(spark, dir, "pq")
  }

  /** DURABLE append for the PQ layout: encoded arrival codes append to
    * `codes/`, their raw vectors to `corpus/` (the rerank fetch side).
    * Two independent parquet appends — on a failure between them the
    * corpus may briefly lead the codes (rerank fetches by shortlist
    * vec_id, so an orphan corpus row is unreachable until its code
    * lands; re-running the append is the remedy). Kind-checked first.
    */
  def appendPq(dir: String, codesArrivals: DataFrame,
               corpusArrivals: DataFrame): Unit = {
    val spark = codesArrivals.sparkSession
    readManifest(spark, dir, "pq")
    val m = readCodebooks(spark, dir).length
    corpusArrivals.select(col("vec_id"), col("embedding"))
      .write.mode(SaveMode.Append).parquet(s"$dir/corpus")
    codesArrivals
      .select(col("vec_id") +: (0 until m).map(mi => col(s"code_$mi")): _*)
      .write.mode(SaveMode.Append).parquet(s"$dir/codes")
  }

  /** (codes, codebooks, corpus). */
  def loadPq(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Array[Double]]], DataFrame) = {
    readManifest(spark, dir, "pq")
    val codebooks = readCodebooks(spark, dir)
    val m = codebooks.length
    val codes = spark.read.parquet(s"$dir/codes")
      .select(col("vec_id") +: (0 until m).map(mi => col(s"code_$mi")): _*)
    val corpus = spark.read.parquet(s"$dir/corpus")
      .select(col("vec_id"), col("embedding"))
    (codes, codebooks, corpus)
  }

  // ------------------------------------------------------------------
  // IVF-PQ
  // ------------------------------------------------------------------

  def saveIvfPq(dir: String, codes: DataFrame, centroids: DataFrame,
                codebooks: Array[Array[Array[Double]]]): Unit = {
    val spark = codes.sparkSession
    val m = codebooks.length
    codes.select(Seq(col("vec_id"), col("cell")) ++
        (0 until m).map(mi => col(s"code_$mi")) ++
        (0 until m).map(mi => col(s"recon2_$mi")): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell").parquet(s"$dir/codes")
    centroids.select(col("cell"), col("centroid"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    writeCodebooks(spark, dir, codebooks)
    writeManifest(spark, dir, "ivfpq")
  }

  /** DURABLE append for the IVF-PQ layout: encoded arrival rows
    * (cell + codes + reconstruction norms) append into the
    * cell-partitioned code table — files land only in the touched
    * cells' directories. Kind-checked first.
    */
  def appendIvfPq(dir: String, codesArrivals: DataFrame): Unit = {
    val spark = codesArrivals.sparkSession
    readManifest(spark, dir, "ivfpq")
    val m = readCodebooks(spark, dir).length
    codesArrivals.select(Seq(col("vec_id"), col("cell")) ++
        (0 until m).map(mi => col(s"code_$mi")) ++
        (0 until m).map(mi => col(s"recon2_$mi")): _*)
      .write.mode(SaveMode.Append)
      .partitionBy("cell").parquet(s"$dir/codes")
  }

  /** (codes, centroids, codebooks). */
  def loadIvfPq(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Array[Double]]]) = {
    readManifest(spark, dir, "ivfpq")
    val codebooks = readCodebooks(spark, dir)
    val m = codebooks.length
    val codes = spark.read.parquet(s"$dir/codes")
      .select(Seq(col("vec_id"), col("cell").cast("int")) ++
        (0 until m).map(mi => col(s"code_$mi")) ++
        (0 until m).map(mi => col(s"recon2_$mi")): _*)
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select(col("cell"), col("centroid"))
    (codes, centroids, codebooks)
  }

  // ------------------------------------------------------------------
  // Maintenance
  // ------------------------------------------------------------------

  /** COMPACT a saved index's big tables in place — the maintenance op
    * a store runs after many small [[appendIvf]]/[[appendPq]]/
    * [[appendIvfPq]] batches (each append adds a file set per touched
    * partition; a year of micro-batch appends is a year of small
    * files). Each table is rewritten through a temp directory and
    * swapped in via filesystem rename (Hadoop `FileSystem`, so the
    * same code compacts local disk or HDFS-style stores):
    * cell-partitioned tables land one file per cell (a `repartition`
    * on the partition column puts each cell in exactly one task),
    * flat tables coalesce to ⌈bytes / target⌉ files (default target
    * 128 MB per file — `spark.graft.compactTargetBytes`). The rewrite
    * fully materializes into the temp dir BEFORE the original is
    * removed, so a crash leaves either the old or the new complete
    * table (plus, at worst, an orphaned `.compact` temp dir the next
    * compact clears). Readers opened before the swap may fail
    * mid-scan — the standard table-maintenance caveat; reopen handles
    * after compacting. Results are bit-identical (IndexStoreSpec).
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val kind = spark.read.parquet(s"$dir/manifest")
      .collect()(0).getAs[String]("kind")
    val hconf = spark.sparkContext.hadoopConfiguration
    def swap(sub: String, partitioned: Boolean): Unit = {
      val src = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = src.getFileSystem(hconf)
      if (!fs.exists(src)) return
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/$sub.compact")
      fs.delete(tmp, true)
      val df = spark.read.parquet(src.toString)
      if (partitioned)
        df.repartition(col("cell"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("cell").parquet(tmp.toString)
      else {
        val targetBytes = spark.conf
          .getOption("spark.graft.compactTargetBytes")
          .map(_.toLong).getOrElse(128L * 1024 * 1024)
        val bytes = fs.getContentSummary(src).getLength
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
        df.coalesce(nFiles.toInt)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      }
      fs.delete(src, true)
      require(fs.rename(tmp, src),
        s"compact: rename $tmp -> $src failed; recover from $tmp")
    }
    kind match {
      case "ivf" => swap("assigned", partitioned = true)
      case "pq" =>
        swap("codes", partitioned = false)
        swap("corpus", partitioned = false)
      case "ivfpq" => swap("codes", partitioned = true)
      case "bloom" => swap("words", partitioned = false)
      case other => throw new IllegalStateException(
        s"$dir/manifest: unknown kind '$other'")
    }
  }

  // ------------------------------------------------------------------
  // Bloom
  // ------------------------------------------------------------------

  def saveBloom(dir: String, words: DataFrame, mBits: Int): Unit = {
    val spark = words.sparkSession
    words.select(col("w"), col("word"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/words")
    writeManifest(spark, dir, "bloom", mBits.toLong)
  }

  /** (words, mBits) — the carried modulus survives the round-trip, so
    * a probe against a loaded sketch can no more mismatch its modulus
    * than against a live one.
    */
  def loadBloom(spark: SparkSession, dir: String): (DataFrame, Int) = {
    val man = readManifest(spark, dir, "bloom")
    val words = spark.read.parquet(s"$dir/words")
      .select(col("w"), col("word"))
    (words, man.m_bits.toInt)
  }
}
