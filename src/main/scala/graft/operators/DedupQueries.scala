package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` table — the
  * training-data-pipeline surface: exact, normalized, exact n-gram
  * Jaccard, MinHash+LSH, SimHash. All are pure DataFrame plans (no UDFs)
  * so they stay inside WholeStageCodegen and scale as shuffles on
  * doc/shingle keys.
  */
object DedupQueries {

  /** Word 3-gram shingle SET per document as an array column — the one
    * shingling definition every dedup operator derives from (d03/d06/
    * d07/d08 explode it; d04 keeps the array form for per-row
    * signatures; MinHashArraySpec reuses it). Guarded for <3-token docs.
    */
  private[graft] def shingleArrays(s: SparkSession, d: String): DataFrame =
    // shingling + downstream signature hashing are the compute-heavy
    // per-row work of this family — don't inherit a narrow scan's
    // parallelism (QueryDef.scaleOut: no-op when the scan already has
    // more splits than cores)
    shingleArraysOf(QueryDef.scaleOut(Tables.documents(s, d)))

  /** [[shingleArrays]] over an arbitrary documents frame (`key`, text)
    * — shared with the streaming verify step so stream and batch agree
    * on the shingle definition by construction, and keyed by `source`
    * instead of `doc_id` for the corpus-level d14 audit.
    */
  private[graft] def shingleArraysOf(docs: DataFrame,
                                     key: String = "doc_id"): DataFrame =
    docs
      .select(col(key), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col(key), array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("sh"))

  /** Exploded (doc_id, shingle) form of [[shingleArrays]]. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    shingleArrays(s, d).select(col("doc_id"), explode(col("sh")).as("s"))

  /** Near-dup cluster labels (doc_id, canonical_id): Jaccard≥0.5 pair
    * graph → connected components, MEMOIZED per (session, dir) so
    * compositions (d07's keep-list runs dedup ∘ quality in one pipeline)
    * reuse d06's labels instead of replaying the shingle join and the
    * whole component iteration — the result is already materialized
    * executor-side (localCheckpoint inside ConnectedComponents), so the
    * memo holds a small handle, not a plan to recompute. BOUNDED: an
    * access-ordered LRU capped at 16 entries, so a long-lived session
    * scanning many dirs can't accumulate cached plans (evicted handles
    * are reclaimed by the ContextCleaner once unreachable), and
    * explicitly invalidatable via [[invalidateClusterLabels]] when a
    * dir's content changes.
    */
  private val maxMemoEntries = 16
  private val clusterMemo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      maxMemoEntries, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > maxMemoEntries
    }
  // Per-key generation, bumped by invalidateClusterLabels: a compute that
  // was already in flight when an invalidation arrived must NOT re-insert
  // labels derived from the pre-invalidation data, so the put is gated on
  // the generation observed before the compute started.
  private val memoGen =
    new java.util.HashMap[(SparkSession, String), java.lang.Long]()
  private def genOf(key: (SparkSession, String)): Long =
    Option(memoGen.get(key)).map(_.longValue).getOrElse(0L)

  /** Observe the current generation for (s, dir) — pair with
    * [[putLabelsIfCurrent]]; package-private so ClusterMemoSpec can
    * exercise the invalidate-during-compute race deterministically.
    */
  private[operators] def labelGeneration(s: SparkSession, dir: String): Long =
    clusterMemo.synchronized(genOf((s, dir)))

  /** Insert computed labels only if no invalidation happened since
    * `startGen` was observed; returns whether the put happened.
    */
  private[operators] def putLabelsIfCurrent(s: SparkSession, dir: String,
                                            startGen: Long,
                                            labels: DataFrame): Boolean =
    clusterMemo.synchronized {
      val key = (s, dir)
      val ok = genOf(key) == startGen
      if (ok) clusterMemo.put(key, labels)
      ok
    }

  /** Drop the memoized cluster labels for `dir` (e.g. after rewriting
    * its documents); the next d06/d07 call recomputes from the current
    * data. No-op if nothing is memoized. Any label computation in flight
    * at the moment of invalidation is discarded rather than cached (it
    * may have read the old data).
    */
  def invalidateClusterLabels(s: SparkSession, dir: String): Unit =
    clusterMemo.synchronized {
      val key = (s, dir)
      clusterMemo.remove(key)
      memoGen.put(key, java.lang.Long.valueOf(genOf(key) + 1L))
      ()
    }

  private[operators] def clusterLabels(s: SparkSession, d: String): DataFrame = {
    val key = (s, d)
    // check-compute-put with the COMPUTE outside the monitor: the label
    // run is minutes of Spark jobs, and holding the lock through it
    // would serialize unrelated dirs and block invalidation (the old
    // computeIfAbsent held its bin lock just the same). A concurrent
    // duplicate compute for the SAME dir is possible and harmless —
    // both produce identical labels, last put wins. Correctness under
    // invalidation comes from the generation check at put time.
    val (cached, startGen) = clusterMemo.synchronized(
      (Option(clusterMemo.get(key)), genOf(key)))
    cached.getOrElse {
      val labels = clusterLabelsOf(Tables.documents(s, d))
      putLabelsIfCurrent(s, d, startGen, labels)
      labels
    }
  }

  /** The label computation proper, over any documents frame — the
    * [[graft.api.Graft.nearDupClusters]] facade path (unmemoized; the
    * gate's [[clusterLabels]] wraps it in the per-(session, dir) memo).
    * Result is materialized executor-side (localCheckpoint inside
    * ConnectedComponents), so the returned handle is cheap to reuse.
    */
  private[graft] def clusterLabelsOf(docs: DataFrame): DataFrame = {
    // the same opt-in fence as d03/e02: the exact shingle inverted-index
    // self-join fans a shingle in k docs out to k² pairs — above the
    // guard size the df-capped variant is the scale path
    QueryDef.requireQuadraticOptIn(docs,
      "nearDupClusters (exact Jaccard pair graph)",
      "nearDupClusters(docs, maxDocFreq) — the df-capped variant")
    val sh = shingleArraysOf(docs)
      .select(col("doc_id"), explode(col("sh")).as("s")).cache()
    try clusterLabelsFromShingles(sh) finally sh.unpersist()
  }

  /** [[clusterLabelsOf]] with d08's document-frequency cap — the SCALE
    * path for near-dup clustering: shingles occurring in more than
    * `maxDocFreq` documents are excluded from BOTH the inverted index
    * and the per-doc set sizes (exactly d08's mitigation, feeding the
    * same ConnectedComponents), bounding the self-join fan-out at
    * (maxDocFreq choose 2) pairs per shingle no matter how hot a
    * stop-phrase gets. Dropping a ubiquitous shingle only removes an
    * uninformative feature: when no shingle exceeds the cap the result
    * EQUALS the exact path (DedupCapSpec). Unfenced — the cap is the
    * fence. Gate: `d18_clusters_capped`.
    */
  private[graft] def clusterLabelsOfCapped(docs: DataFrame,
                                           maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1 (got $maxDocFreq)")
    val sh0 = shingleArraysOf(docs)
      .select(col("doc_id"), explode(col("sh")).as("s"))
    val rare = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select(col("s"))
    // lazy localCheckpoint (d08's pattern): blocks die with the handle
    // via the ContextCleaner instead of living in CacheManager forever
    val sh = sh0.join(rare, Seq("s")).localCheckpoint(eager = false)
    clusterLabelsFromShingles(sh)
  }

  /** The shared pair-graph → connected-components core: `sh` is the
    * exploded (doc_id, s) shingle table (df-capped or not) — Jaccard
    * ≥ 0.5 pairs over its inverted index, each doc labeled with its
    * component's min doc_id.
    */
  private def clusterLabelsFromShingles(sh: DataFrame): DataFrame = {
    val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = sh.select(col("doc_id").as("da"), col("s"))
    val b = sh.select(col("doc_id").as("db"), col("s"))
    val pairs = a.join(b, Seq("s")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
      .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
      .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
      .filter(round(col("c") / (col("na") + col("nb") - col("c")), 4) >= 0.5)
      .select(col("da"), col("db")).cache()
    try
      ConnectedComponents.run(pairs).labels
        .select(col("doc_id"), col("label").as("canonical_id"))
    finally pairs.unpersist()
  }

  private[graft] val shinglesSql =
    """words AS (SELECT doc_id, string_split(text, ' ') w
      |          FROM documents WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |         unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                 for i in generate_series(1, len(w)-2)]) s
      |       FROM words)""".stripMargin

  /** Exact duplicate groups by content hash over an arbitrary documents
    * frame — the [[graft.api.Graft.exactDedup]] body: one
    * map-side-combined shuffle at any scale.
    */
  private[graft] def exactDedupOf(docs: DataFrame, textCol: String = "text",
                                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** [[exactDedupOf]] after lowercasing + whitespace collapse — the
    * [[graft.api.Graft.normalizedDedup]] body.
    */
  private[graft] def normalizedDedupOf(docs: DataFrame,
                                       textCol: String = "text",
                                       idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(regexp_replace(lower(col(textCol)), "\\s+", " "))
        .as("content_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: hash-groupBy on content, keep min doc_id per group —
    * one map-side-combined shuffle at scale.
    */
  val d01ExactDedup = QueryDef(
    "d01_exact_dedup",
    // routed through the user-facing facade so the oracle gate covers
    // the path a real pipeline calls (graft.api.Graft quickstart)
    (s, d) => graft.api.Graft.exactDedup(Tables.documents(s, d))
      .orderBy(col("keep_doc_id")),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
           |  count(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin))

  /** Normalization dedup: lowercase + collapsed whitespace before
    * hashing — catches formatting-only duplicates.
    */
  val d02NormalizedDedup = QueryDef(
    "d02_normalized_dedup",
    (s, d) => graft.api.Graft.normalizedDedup(Tables.documents(s, d))
      .orderBy(col("keep_doc_id")),
    Some("""SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS content_hash,
           |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
           |FROM documents GROUP BY 1 ORDER BY keep_doc_id""".stripMargin))

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.5): shingle
    * inverted index self-join → common counts → Jaccard. The exact
    * baseline that MinHash approximates; at 100 TB the self-join on hot
    * shingles is the bottleneck — that is what d04's LSH banding removes.
    * Guarded: inputs above `spark.graft.quadraticMaxRows` throw unless
    * `spark.graft.allowQuadratic=true` (see
    * [[QueryDef.requireQuadraticOptIn]]).
    */
  val d03NgramJaccard = QueryDef(
    "d03_ngram_jaccard",
    (s, d) => {
      QueryDef.requireQuadraticOptIn(
        Tables.documents(s, d), "d03_ngram_jaccard", "d04/d08/d09")
      // lazy localCheckpoint, not cache(): blocks die with the handle
      // (ContextCleaner) instead of living in CacheManager forever,
      // and eager = false defers the materializing job to the caller's
      // first action (same pattern as Graft.decontaminate's bench side)
      val sh = shingles(s, d).localCheckpoint(eager = false)
      val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("da"), col("s"))
      val b = sh.select(col("doc_id").as("db"), col("s"))
      val common = a.join(b, Seq("s")).filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
      common
        .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), col("jaccard"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""WITH $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
            |FROM common JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5
            |ORDER BY da, db""".stripMargin))

  /** MinHash + LSH near-dup pairs (threshold 0.8): 64 universal hashes
    * over a single xxhash64 base, banded 16×4 — candidate pairs only ever
    * meet inside a bucket (no all-pairs join), then exact Jaccard
    * verifies. Banding 16 bands × 4 rows gives >99.9% recall at J≥0.8
    * (1-(1-s⁴)¹⁶).
    *
    * Scale shape: shingle sets ride as an array column, so signatures
    * compute inside a single projection (functions.MinHashArray — zero
    * shuffle, no exploded (doc,shingle) rows), the only shuffles are the
    * band-bucket self-join and candidate distinct, and verification is a
    * per-pair `array_intersect` instead of an inverted-index join — work
    * stays proportional to bucket collisions, not corpus size².
    */
  /** d04's body over an arbitrary documents frame (doc_id, text) — the
    * [[graft.api.Graft.minhashDedup]] facade path. Unsorted; the gate
    * adds its output sort.
    *
    * The banding is DERIVED from the threshold (round 9): the widest
    * rows (= most selective buckets) whose per-pair candidate recall
    * at J = threshold still clears 99% — 1−(1−t^r)^(64/r) ≥ 0.99 over
    * r ∈ {8, 4, 2, 1}. At the default 0.8 this derives the classic
    * 16×4 (recall ≈ 1−10⁻⁶, the gate's banding); at 0.5 it derives
    * 32×2 (recall ≈ 0.9999) where the old fixed 16×4 silently dropped
    * ~36% of qualifying pairs; at 0.95 it derives 8×8, cutting
    * candidate volume. MinHashRecallSpec proves the 0.5 case against
    * the exact quadratic baseline (d03's answer set).
    */
  /** Widest rows-per-band whose per-pair candidate recall at
    * J = threshold still clears 99% — 1−(1−t^r)^(n/r) ≥ 0.99 over
    * r ∈ {8, 4, 2, 1}. The round-9 derivation, shared by d04 and the
    * durable LSH index so their banding cannot drift.
    */
  private[graft] def derivedRowsPerBand(threshold: Double,
                                        numHashes: Int = 64): Int =
    Seq(8, 4, 2, 1).find { r =>
      1.0 - math.pow(1.0 - math.pow(threshold, r),
        numHashes.toDouble / r) >= 0.99
    }.getOrElse(1)

  private[graft] def minhashPairs(docsRaw: DataFrame,
                                  threshold: Double = 0.8): DataFrame = {
    val numHashes = 64
    val rowsPerBand = derivedRowsPerBand(threshold, numHashes)
    val bands = numHashes / rowsPerBand
    val prime = 2038074743L

    // per-doc shingle array + count + signature, all in one pass
    val docs = shingleArraysOf(docsRaw)
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
        graft.functions.MinHashArray.minhash_array(
          expr(s"transform(sh, x -> pmod(xxhash64(x), ${prime}L))"),
          numHashes, 42L, prime).as("sig"))
      // lazy localCheckpoint: feeds banding AND both verify joins;
      // ContextCleaner releases the blocks when the handle dies
      .localCheckpoint(eager = false)

    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        hash(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand)).as("sig"))
    }
    val buckets = docs.select(col("doc_id"),
      explode(array(bandCols: _*)).as("bucket"))
    val cand = buckets.alias("x")
      .join(buckets.alias("y"), col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()

    // exact-Jaccard verification: fetch both shingle arrays, intersect
    cand
      .join(docs.select(col("doc_id").as("da"), col("sh").as("sha"),
        col("n").as("na")), Seq("da"))
      .join(docs.select(col("doc_id").as("db"), col("sh").as("shb"),
        col("n").as("nb")), Seq("db"))
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  val d04MinHashLsh = QueryDef(
    "d04_minhash_lsh",
    (s, d) => graft.api.Graft.minhashDedup(
        QueryDef.scaleOut(Tables.documents(s, d)))
      .orderBy(col("da"), col("db")),
    // candidates are verified with EXACT Jaccard, and 16×4 banding has
    // ~1-10⁻⁶ recall at J≥0.8 on 64 hashes — so the output equals the
    // exact all-pairs answer (validated against this oracle at sf0.01)
    Some(s"""WITH $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
            |FROM common JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.8
            |ORDER BY da, db""".stripMargin))

  /** SimHash near-dup pairs: 60-bit signature from token hashes (sign of
    * per-bit term-frequency-weighted sums), 4×15-bit band blocking,
    * Hamming ≤ 8 verify via bit_count(xor). The token hash is the top 60
    * bits of md5 (`conv(substr(md5(tok),1,15),16,10)`), which DuckDB
    * reproduces exactly (`('0x' || substr(md5(tok),1,15))::BIGINT`), so
    * unlike an xxhash64-based signature this variant is fully
    * oracle-gated; 60 bits also keeps every `1 << k` inside a signed
    * BIGINT in both engines. The whole plan is one groupBy shuffle for
    * the signatures + the band-bucket self-join — no all-pairs work.
    */
  /** d05's body over any documents frame —
    * [[graft.api.Graft.simhashNearDups]]. 4×15-bit banding is complete
    * for Hamming ≤ 3 and probabilistic beyond (the conventional SimHash
    * LSH regime; recall to the ≤ 8 verify threshold is high but not
    * guaranteed, unlike mm07's 5-band exact-guarantee scheme). Unsorted.
    */
  private[graft] def simhashPairs(docsRaw: DataFrame,
                                  maxHamming: Int = 8): DataFrame = {
    val toks = docsRaw
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val bitSums = (0 until 60).map { k =>
      sum(when(expr(s"((h >> $k) & 1) = 1"), 1).otherwise(-1)).as(s"b$k")
    }
    val sig = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(k =>
          when(col(s"b$k") > 0, lit(1L << k)).otherwise(0L))
          .reduce(_ bitwiseOR _).as("simhash"))
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(bnd =>
        struct(lit(bnd).as("band"),
          expr(s"(simhash >> ${bnd * 15}) & 32767").as("chunk"))): _*))
        .as("bucket"))
    banded.alias("x")
      .join(banded.alias("y"), col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        expr("CAST(bit_count(x.simhash ^ y.simhash) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  val d05SimHash = QueryDef(
    "d05_simhash",
    (s, d) => graft.api.Graft.simhashNearDups(Tables.documents(s, d))
      .orderBy(col("da"), col("db")),
    Some {
      val bitSumsSql = (0 until 60)
        .map(k => s"sum(CASE WHEN ((h >> $k) & 1) = 1 THEN 1 ELSE -1 END) AS b$k")
        .mkString(",\n    ")
      val sigSql = (0 until 60)
        .map(k => s"(CASE WHEN b$k > 0 THEN ${1L << k} ELSE 0 END)")
        .mkString(" +\n    ")
      s"""WITH toks AS (
         |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents)),
         |bits AS (
         |  SELECT doc_id,
         |    $bitSumsSql
         |  FROM toks GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id,
         |    $sigSql AS simhash
         |  FROM bits),
         |banded AS (
         |  SELECT doc_id, simhash, band,
         |    ((simhash >> (band * 15)) & 32767) AS chunk
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
         |    CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |  FROM banded x JOIN banded y
         |    ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
         |SELECT da, db, hamming FROM cand
         |WHERE hamming <= 8 ORDER BY da, db""".stripMargin
    })

  /** Near-dup CLUSTERING: connected components over the Jaccard≥0.5 pair
    * graph, each document mapped to its component's min doc_id (the
    * canonical survivor — what a dedup pipeline actually emits).
    * Each round hooks every node to the min label among itself and its
    * neighbors, then pointer-jumps (label ← label(label)) — the
    * Shiloach-Vishkin shortcutting that converges in O(log n) distributed
    * rounds even on long path-shaped components, where plain neighbor-min
    * propagation needs O(diameter) rounds. Oracle: recursive CTE closure.
    */
  val d06DedupClusters = QueryDef(
    "d06_dedup_clusters",
    (s, d) => clusterLabels(s, d).orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |pairs AS (
            |  SELECT da, db FROM common
            |  JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |  WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5),
            |edges AS (
            |  SELECT da, db FROM pairs UNION SELECT db, da FROM pairs),
            |reach(src, dst) AS (
            |  SELECT da, db FROM edges
            |  UNION
            |  SELECT r.src, e.db FROM reach r JOIN edges e ON r.dst = e.da
            |  WHERE r.src <> e.db)
            |SELECT doc_id, least(doc_id, min(dst)) AS canonical_id FROM (
            |  SELECT src AS doc_id, dst FROM reach)
            |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** d06's clustering through the DF-CAPPED scale path — d08's
    * document-frequency mitigation feeding the same connected
    * components: shingles in more than 100 documents are dropped from
    * BOTH the inverted index and the set sizes before the pair graph,
    * so the self-join fan-out is bounded at (cap choose 2) per shingle
    * at any corpus size (the production shape; the exact d06 path is
    * fenced by [[QueryDef.requireQuadraticOptIn]]). Oracle: d06's
    * recursive-CTE closure over the identically capped shingle table.
    */
  val d18ClustersCapped = QueryDef(
    "d18_clusters_capped",
    (s, d) => graft.api.Graft
      .nearDupClusters(Tables.documents(s, d), maxDocFreq = 100)
      .orderBy(col("doc_id")),
    Some(s"""WITH RECURSIVE $shinglesSql,
            |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
            |shc AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
            |cnt AS (SELECT doc_id, count(*) n FROM shc GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |pairs AS (
            |  SELECT da, db FROM common
            |  JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |  WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5),
            |edges AS (
            |  SELECT da, db FROM pairs UNION SELECT db, da FROM pairs),
            |reach(src, dst) AS (
            |  SELECT da, db FROM edges
            |  UNION
            |  SELECT r.src, e.db FROM reach r JOIN edges e ON r.dst = e.da
            |  WHERE r.src <> e.db)
            |SELECT doc_id, least(doc_id, min(dst)) AS canonical_id FROM (
            |  SELECT src AS doc_id, dst FROM reach)
            |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** The pipeline verdict: keep a document iff it is its cluster's
    * canonical survivor AND clears the quality bar — the composition a
    * training-data pipeline actually ships (dedup ∘ quality filter).
    */
  /** The d07/d16 per-row quality signal (mean-token-length ×0.2 +
    * distinct-token-ratio ×0.8) — one definition so the keep-list and
    * the argmax-survivor policies score identically; division/
    * multiplication only (no sums), hence bit-identical cross-engine.
    */
  private def qualityScored(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        ((length(col("text")).cast("double")
          - size(split(col("text"), " ")) + 1)
          / size(split(col("text"), " ")) * 0.2 +
          size(array_distinct(split(col("text"), " "))).cast("double")
            / size(split(col("text"), " ")) * 0.8).as("q"))

  val d07KeepList = QueryDef(
    "d07_keep_list",
    (s, d) => {
      // reuses d06's memoized cluster labels: one ConnectedComponents run
      // per (session, dir) even when both queries execute in one job
      val clusters = clusterLabels(s, d)
        .withColumnRenamed("doc_id", "cdoc")
      val quality = qualityScored(s, d)
      quality.join(clusters, quality("doc_id") === clusters("cdoc"), "left")
        .select(col("doc_id"),
          (coalesce(col("canonical_id"), col("doc_id")) === col("doc_id") &&
            col("q") >= 1.15).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |pairs AS (
            |  SELECT da, db FROM common
            |  JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |  WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5),
            |edges AS (
            |  SELECT da, db FROM pairs UNION SELECT db, da FROM pairs),
            |reach(src, dst) AS (
            |  SELECT da, db FROM edges
            |  UNION
            |  SELECT r.src, e.db FROM reach r JOIN edges e ON r.dst = e.da
            |  WHERE r.src <> e.db),
            |canon AS (
            |  SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
            |  FROM reach GROUP BY src),
            |quality AS (
            |  SELECT doc_id,
            |    ((length(text) - len(string_split(text, ' ')) + 1.0)
            |      / len(string_split(text, ' '))) * 0.2 +
            |    (len(list_distinct(string_split(text, ' ')))
            |      * 1.0 / len(string_split(text, ' '))) * 0.8 AS q
            |  FROM documents)
            |SELECT quality.doc_id,
            |  (coalesce(canon.canonical_id, quality.doc_id) = quality.doc_id
            |   AND q >= 1.15) AS keep
            |FROM quality LEFT JOIN canon ON quality.doc_id = canon.doc_id
            |ORDER BY quality.doc_id""".stripMargin))

  /** Document-frequency-capped Jaccard: shingles occurring in more than
    * `dfCap` documents are excluded from BOTH the index and the set
    * sizes — the standard hot-key mitigation that bounds the inverted-
    * index self-join fan-out at (dfCap choose 2) pairs per shingle,
    * making the exact path survive corpus growth. The cap is mirrored in
    * the oracle so semantics stay checkable.
    */
  val d08JaccardCapped = QueryDef(
    "d08_jaccard_capped",
    (s, d) => {
      val dfCap = 100
      val sh = shingles(s, d)
      val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap).select(col("s"))
      val shc = sh.join(rare, Seq("s")).localCheckpoint(eager = false)
      val cnt = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = shc.select(col("doc_id").as("da"), col("s"))
      val b = shc.select(col("doc_id").as("db"), col("s"))
      val common = a.join(b, Seq("s")).filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
      common
        .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
        .filter(col("jaccard") >= 0.5)
        .select(col("da"), col("db"), col("jaccard"))
        .orderBy(col("da"), col("db"))
    },
    Some(s"""WITH $shinglesSql,
            |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 100),
            |shc AS (SELECT doc_id, s FROM sh JOIN rare USING (s)),
            |cnt AS (SELECT doc_id, count(*) n FROM shc GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT da, db, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
            |FROM common JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5
            |ORDER BY da, db""".stripMargin))

  /** MinHash+LSH with a BAND-BUCKET population cap — the skew
    * mitigation d04's plan audit calls for: at web scale a degenerate
    * band bucket (boilerplate/templated documents that share a
    * signature slice) turns the bucket self-join quadratic on that one
    * key. Buckets holding more than `cap` docs are excluded from
    * candidate generation entirely (their members are boilerplate
    * near-identical clusters a pipeline dedups via d01/d02 exact
    * hashing anyway), bounding per-bucket fan-out at (cap choose 2)
    * exactly like d08 bounds shingle fan-out.
    *
    * Cross-engine gating of an APPROXIMATE op: the shingle hash is
    * md5-derived (the one hash both engines share), the 64 universal-
    * hash coefficients come from [[graft.functions.MinHashArray
    * .coefficients]] and are INLINED as literals into the oracle text,
    * and band keys are plain string joins of signature slices — so
    * DuckDB replays signatures, banding, the cap, and verification
    * bit-for-bit. Unlike d04 (gated vs the exact-Jaccard answer), this
    * gate checks the LSH mechanics themselves, including which pairs
    * the cap DROPS.
    */
  val d09MinHashCapped = QueryDef(
    "d09_minhash_lsh_capped",
    (s, d) => {
      val numHashes = 64
      val bands = 16
      val rowsPerBand = numHashes / bands
      val prime = 2038074743L
      val cap = 50

      val docs = shingleArrays(s, d)
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
          graft.functions.MinHashArray.minhash_array(
            expr("transform(sh, x -> pmod(cast(conv(substr(md5(x), 1, 15)," +
              s" 16, 10) as bigint), ${prime}L))"),
            numHashes, 42L, prime).as("sig"))
        .localCheckpoint(eager = false)

      val bandKeys = (0 until bands).map { bnd =>
        concat_ws(",", lit(bnd) +: (0 until rowsPerBand).map(r =>
          col("sig").getItem(bnd * rowsPerBand + r)): _*)
      }
      val buckets = docs.select(col("doc_id"),
        explode(array(bandKeys: _*)).as("bkey"))
      // population cap: one map-side-combined count per bucket, hot
      // buckets never reach the self-join
      val cool = buckets.groupBy(col("bkey"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
        .select(col("bkey"))
      val inCool = buckets.join(cool, Seq("bkey"))
      val cand = inCool.alias("x")
        .join(inCool.alias("y"), col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()

      cand
        .join(docs.select(col("doc_id").as("da"), col("sh").as("sha"),
          col("n").as("na")), Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("sh").as("shb"),
          col("n").as("nb")), Seq("db"))
        .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", round(col("c") / (col("na") + col("nb") - col("c")), 4))
        .filter(col("jaccard") >= 0.8)
        .select(col("da"), col("db"), col("jaccard"))
        .orderBy(col("da"), col("db"))
    },
    Some {
      val (a, b) = graft.functions.MinHashArray.coefficients(64, 42L)
      val prime = 2038074743L
      val sigCols = (0 until 64)
        .map(k => s"min((h * ${a(k)} + ${b(k)}) % $prime) AS m$k")
        .mkString(",\n    ")
      val bandCases = (0 until 16).map { bnd =>
        val parts = (0 until 4).map(r => s"m${bnd * 4 + r}")
          .mkString(" || ',' || ")
        s"WHEN $bnd THEN '$bnd,' || $parts"
      }.mkString("\n      ")
      s"""WITH $shinglesSql,
         |hashes AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $prime AS h
         |  FROM sh),
         |sig AS (
         |  SELECT doc_id,
         |    $sigCols
         |  FROM hashes GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id,
         |    CASE band
         |      $bandCases
         |    END AS bkey
         |  FROM sig, (SELECT unnest(generate_series(0, 15)) AS band) tb),
         |cool AS (SELECT bkey FROM bands GROUP BY bkey HAVING count(*) <= 50),
         |bc AS (SELECT doc_id, bkey FROM bands JOIN cool USING (bkey)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |  FROM bc x JOIN bc y ON x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
         |common AS (
         |  SELECT c.da, c.db, count(*) AS cm
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.da
         |  JOIN sh b ON b.doc_id = c.db AND b.s = a.s
         |  GROUP BY c.da, c.db)
         |SELECT da, db, round(cm * 1.0 / (x.n + y.n - cm), 4) AS jaccard
         |FROM common JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
         |WHERE round(cm * 1.0 / (x.n + y.n - cm), 4) >= 0.8
         |ORDER BY da, db""".stripMargin
    })

  /** Segment-level dedup (the line-level dedup of CCNet/RefinedWeb,
    * adapted to a corpus without newlines): each document splits into
    * non-overlapping 10-token segments; a segment is a duplicate when the
    * same segment text already appears in a lower-numbered document
    * (keep-first-occurrence, like d01's doc-level rule but at segment
    * granularity). Emits per-doc duplicate fraction plus the md5 of the
    * cleaned text so the gate pins the exact reassembled output.
    *
    * Scale shape: segments shuffle once on their md5 (narrow key,
    * map-side combinable min), the keeper table joins back on the same
    * key (co-partitioned, no second shuffle of the big side under AQE),
    * and reassembly is a per-doc aggregation. No doc-to-doc joins — a
    * linear pipeline at 100 TB, unlike pairwise dedup.
    */
  val d10SegmentDedup = QueryDef(
    "d10_segment_dedup",
    (s, d) => {
      val segLen = 10
      val segs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("nseg",
          ceil(size(col("toks")) / lit(segLen.toDouble)).cast("int"))
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, nseg), p -> struct(p AS pos, " +
            s"concat_ws(' ', slice(toks, (p - 1) * $segLen + 1, $segLen)) AS seg))"))
          .as("x"))
        .select(col("doc_id"), col("x.pos").as("pos"), col("x.seg").as("seg"),
          md5(col("x.seg")).as("h"))
      val keeper = segs.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
      segs.join(keeper, "h")
        .withColumn("keep", col("doc_id") === col("keeper"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_segments"),
          sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dup_segments"),
          md5(array_join(transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("seg"))))),
            x => x.getField("seg")), " ")).as("cleaned_md5"))
        .withColumn("dup_frac",
          round(col("n_dup_segments") / col("n_segments").cast("double"), 4))
        .select(col("doc_id"), col("n_segments"), col("n_dup_segments"),
          col("dup_frac"), col("cleaned_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks,
           |    cast(ceil(len(string_split(text, ' ')) / 10.0) AS INT) AS nseg
           |  FROM documents),
           |positions AS (
           |  SELECT doc_id, toks, unnest(generate_series(1, nseg)) AS pos
           |  FROM base),
           |segs AS (
           |  SELECT doc_id, pos,
           |    array_to_string(toks[((pos - 1) * 10 + 1):((pos - 1) * 10 + 10)], ' ') AS seg
           |  FROM positions),
           |hashed AS (SELECT doc_id, pos, seg, md5(seg) AS h FROM segs),
           |keeper AS (SELECT h, min(doc_id) AS keeper FROM hashed GROUP BY h),
           |flagged AS (
           |  SELECT doc_id, pos, seg, (doc_id = keeper) AS keep
           |  FROM hashed JOIN keeper USING (h))
           |SELECT doc_id, count(*) AS n_segments,
           |  cast(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           |  round(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)
           |        / (count(*) * 1.0), 4) AS dup_frac,
           |  md5(coalesce(string_agg(seg, ' ' ORDER BY pos)
           |        FILTER (WHERE keep), '')) AS cleaned_md5
           |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** INTRA-document segment dedup — the within-page repeated-line
    * removal of CCNet/RefinedWeb (boilerplate nav bars, repeated
    * headers), complementing d10's cross-corpus keep-first rule: here a
    * segment is dropped only when the SAME document already contains it
    * at an earlier position. 2-token segments (the synthetic corpus has
    * no longer intra-doc repeats; production would segment on
    * lines/paragraphs — the operator is the same with a different
    * splitter).
    *
    * Scale shape: the whole operator is ONE projection — segments,
    * first-occurrence mask (`filter(segs, (s, i) ->
    * array_position(segs, s) = i + 1)`), reassembly, and stats all
    * evaluate per-row inside whole-stage codegen with ZERO shuffles
    * (the final orderBy exists only for the gate). This is the
    * strictly-better intra-doc counterpart of a groupBy-on-segment
    * plan: nothing leaves its input partition, so 100 TB costs exactly
    * one pass.
    */
  val d11IntraDocDedup = QueryDef(
    "d11_intradoc_dedup",
    (s, d) => {
      val segLen = 2
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("nseg",
          ceil(size(col("toks")) / lit(segLen.toDouble)).cast("int"))
        .withColumn("segs", expr(
          s"transform(sequence(1, nseg), p -> concat_ws(' ', " +
            s"slice(toks, (p - 1) * $segLen + 1, $segLen)))"))
        .withColumn("cleaned",
          expr("filter(segs, (s, i) -> array_position(segs, s) = i + 1)"))
        .select(col("doc_id"),
          col("nseg").cast("long").as("n_segments"),
          (col("nseg") - size(col("cleaned"))).cast("long").as("n_dup_segments"),
          round((col("nseg") - size(col("cleaned")))
            / col("nseg").cast("double"), 4).as("dup_frac"),
          md5(concat_ws(" ", col("cleaned"))).as("cleaned_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks,
           |    cast(ceil(len(string_split(text, ' ')) / 2.0) AS INT) AS nseg
           |  FROM documents),
           |positions AS (
           |  SELECT doc_id, nseg, toks, unnest(generate_series(1, nseg)) AS pos
           |  FROM base),
           |segs AS (
           |  SELECT doc_id, nseg, pos,
           |    array_to_string(toks[((pos - 1) * 2 + 1):((pos - 1) * 2 + 2)], ' ') AS seg
           |  FROM positions),
           |flagged AS (
           |  SELECT doc_id, nseg, pos, seg,
           |    (pos = min(pos) OVER (PARTITION BY doc_id, seg)) AS keep
           |  FROM segs)
           |SELECT doc_id, cast(max(nseg) AS BIGINT) AS n_segments,
           |  cast(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments,
           |  round(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)
           |        / (max(nseg) * 1.0), 4) AS dup_frac,
           |  md5(coalesce(string_agg(seg, ' ' ORDER BY pos)
           |        FILTER (WHERE keep), '')) AS cleaned_md5
           |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Cross-document repeated-substring detection — the exact-substring
    * dedup family popularized for LLM training corpora (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): any
    * word 5-gram occurring in TWO OR MORE documents marks the span it
    * covers for removal. Per document: token count, number of flagged
    * gram starts, tokens covered by the union of flagged spans (interval
    * merge over sorted starts — a single `aggregate` fold, no
    * per-position explode), the covered fraction, and the md5 of the
    * text with covered tokens excised.
    *
    * Lee et al. build a corpus-wide suffix array; the Spark-shaped
    * equivalent is gram-hash → groupBy → flag (one shuffle on the gram
    * hash, map-side combinable), join the flagged minority back, and do
    * all span surgery per-row inside codegen. At 100 TB the flagged set
    * is bounded by the volume of genuinely repeated content (boilerplate
    * headers, licenses) — the same minority-join shape as d09's cool
    * buckets; a df-cap like d08's applies unchanged if boilerplate
    * explodes. Intra-doc repeats are d11's job; this flags only
    * cross-doc spans (count(DISTINCT doc_id) >= 2).
    */
  /** d12's body over any documents frame —
    * [[graft.api.Graft.substringDedup]]: flag word `W`-grams shared
    * across documents, report per-doc coverage and the md5 of the
    * scrubbed text. Unsorted.
    */
  private[graft] def substringScrub(docsRaw: DataFrame,
                                    W: Int = 5): DataFrame = {
        val toks = docsRaw
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")))
        val grams = toks.filter(col("n") >= W)
          .select(col("doc_id"), col("toks"),
            explode(expr(s"sequence(1, n - ${W - 1})")).as("s"))
          .select(col("doc_id"), col("s"),
            expr(s"md5(concat_ws(' ', slice(toks, s, $W)))").as("h"))
        // "gram occurs in >= 2 distinct docs" ⟺ min(doc_id) ≠
        // max(doc_id) within the gram's hash group — ONE window pass
        // over grams shuffled once on h, where the groupBy(h) +
        // join-back shape shuffled the gram table twice AND recomputed
        // the explode+md5 subtree per consumer (guide §2.4; round-16
        // profile: 36 MB shuffled, 2.3 s task time — the heaviest
        // dedup cell after the capped LSH). Flagged set is identical.
        val wGram = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h"))
        val perDoc = grams
          .withColumn("mn", min(col("doc_id")).over(wGram))
          .withColumn("mx", max(col("doc_id")).over(wGram))
          .filter(col("mn") =!= col("mx"))
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("s"))).as("starts"))
        toks.join(perDoc, Seq("doc_id"), "left")
          .withColumn("starts",
            coalesce(col("starts"), array().cast("array<int>")))
          // union length of the sorted spans [s, s+W-1]: classic merge
          // fold — new coverage = span end minus max(previous end, s-1)
          .withColumn("covered", expr(s"""
            aggregate(starts, named_struct('cov', 0, 'pe', 0),
              (acc, st) -> named_struct(
                'cov', acc.cov + greatest(0, st + ${W - 1} - greatest(acc.pe, st - 1)),
                'pe', greatest(acc.pe, st + ${W - 1})),
              acc -> acc.cov)"""))
          .withColumn("cleaned", expr(s"""
            concat_ws(' ', filter(transform(sequence(1, n),
              j -> if(exists(starts, st -> st <= j and j <= st + ${W - 1}),
                      null, toks[j - 1])),
              x -> x is not null))"""))
          .select(col("doc_id"),
            col("n").cast("long").as("n_tokens"),
            size(col("starts")).cast("long").as("n_flagged_grams"),
            col("covered").cast("long").as("covered_tokens"),
            round(col("covered") / col("n").cast("double"), 4)
              .as("covered_frac"),
            md5(col("cleaned")).as("cleaned_md5"))
  }

  val d12SubstringDedup: QueryDef = {
    val W = 5
    QueryDef(
      "d12_substring_dedup",
      (s, d) => graft.api.Graft.substringDedup(
        QueryDef.scaleOut(Tables.documents(s, d)))
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks,
             |    len(string_split(text, ' ')) AS n
             |  FROM documents),
             |grams AS (
             |  SELECT doc_id, s,
             |    md5(array_to_string(toks[s:(s + ${W - 1})], ' ')) AS h
             |  FROM toks, unnest(generate_series(1, n - ${W - 1})) AS u(s)
             |  WHERE n >= $W),
             |flagged AS (
             |  SELECT h FROM grams GROUP BY h
             |  HAVING count(DISTINCT doc_id) >= 2),
             |hits AS (SELECT doc_id, s FROM grams JOIN flagged USING (h)),
             |merged AS (
             |  SELECT doc_id, s,
             |    greatest(0, s + ${W - 1} - greatest(coalesce(max(s + ${W - 1}) OVER (
             |      PARTITION BY doc_id ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), s - 1)) AS adds
             |  FROM hits),
             |perdoc AS (
             |  SELECT doc_id, count(*) AS nf, sum(adds) AS covered
             |  FROM merged GROUP BY doc_id),
             |cleaned AS (
             |  SELECT t.doc_id,
             |    coalesce(string_agg(t.toks[j], ' ' ORDER BY j)
             |      FILTER (WHERE NOT EXISTS (SELECT 1 FROM hits h
             |        WHERE h.doc_id = t.doc_id
             |          AND h.s <= j AND j <= h.s + ${W - 1})), '') AS ctext
             |  FROM toks t, unnest(generate_series(1, t.n)) AS u(j)
             |  GROUP BY t.doc_id)
             |SELECT t.doc_id,
             |  cast(t.n AS BIGINT) AS n_tokens,
             |  cast(coalesce(p.nf, 0) AS BIGINT) AS n_flagged_grams,
             |  cast(coalesce(p.covered, 0) AS BIGINT) AS covered_tokens,
             |  round(coalesce(p.covered, 0) / (t.n * 1.0), 4) AS covered_frac,
             |  md5(c.ctext) AS cleaned_md5
             |FROM toks t
             |LEFT JOIN perdoc p USING (doc_id)
             |JOIN cleaned c ON c.doc_id = t.doc_id
             |ORDER BY doc_id""".stripMargin))
  }

  /** Incremental corpus dedup via a Bloom-filter sketch — the "does this
    * new crawl batch repeat content the 100 TB corpus already holds"
    * question, answered WITHOUT joining the batch against the corpus.
    * The corpus (here docs with doc_id % 5 < 4) is summarized once into
    * a Bloom filter over its distinct 10-token segments (d10's unit):
    * m = 2^20 bits stored as 32768 bit_or-aggregated words (32 bits per
    * BIGINT word — a shift never reaches the sign bit, which DuckDB
    * rejects as overflow, so the oracle replays the exact same packing),
    * k = 3 positions per segment from seeded md5 hashes. The new batch
    * (doc_id % 5 = 4) probes the sketch — a broadcast join on word
    * index — and only the bloom-HIT minority is exact-verified against
    * the corpus segment set, so false positives are counted, never
    * trusted. Per batch doc: distinct-segment count, bloom hits,
    * confirmed dups, false positives, confirmed-dup fraction.
    *
    * Scale shape: the sketch is corpus-size-INDEPENDENT state
    * (m/8 bytes — 128 KiB here; size m to the corpus in production) and
    * MERGEABLE (bit_or of two sketches is the sketch of the union), so
    * corpus growth is incremental: each ingested batch bit_ors its own
    * words in. The batch side never shuffles against the corpus — probes
    * broadcast-join the word table, and the exact-verify join touches
    * only bloom hits (the duplicate minority plus a measured ~0.04% FP
    * tail at 6% sketch load: 417 hits = 415 confirmed + 2 FP at
    * sf0.1). The probe aggregate appears in two plan branches (the
    * verify filter and the final per-doc rollup), but AQE's query-stage
    * cache materializes the shared exchanges ONCE at runtime
    * (spec-asserted) — the batch is scanned a single time. If m
    * outgrows broadcast range the SAME plan
    * degrades gracefully to a co-partitioned int-key join on word index.
    * Every hash is deterministic (top-60-bit md5), so DuckDB replays the
    * entire sketch — build, probe, and verify — making even the
    * probabilistic layer hash-gated.
    */
  /** Bloom parameters shared by the d13 query, its oracle, and the
    * mergeability spec: m = 2^20 bits, 32-bit words, k = 3.
    */
  private[graft] object BloomSketch {
    val segLen = 10
    /** Default filter size. Production sizes m to the corpus (~10 bits
      * per expected distinct segment for ~1% FP at k=3); the gate uses
      * this fixed default so the oracle replays it, and ScaleBench
      * raises it via `spark.graft.bloomBits` when it grows the corpus
      * 10×/100× — a sketch whose load is pinned, not saturating, is the
      * honest scale measurement.
      */
    val mBitsDefault: Int = 1 << 20
    val seeds: Range = 0 until 3
    def mBitsOf(s: SparkSession): Int = {
      val m = s.conf.getOption("spark.graft.bloomBits").map(_.toInt)
        .getOrElse(mBitsDefault)
      // fail loudly on a nonsensical size rather than corrupting every
      // probe: word packing needs a positive multiple of 32
      require(m > 0 && m % 32 == 0,
        s"spark.graft.bloomBits must be a positive multiple of 32, got $m")
      m
    }
    // top 60 bits of md5, as in TextAnalysisQueries.hash60 — positive,
    // identical in Spark and DuckDB
    def posExpr(seed: Int, mBits: Int): String =
      s"cast(conv(substring(md5(concat(h, ':$seed')), 1, 15), 16, 10) " +
        s"as bigint) % $mBits"
    def posSql(seed: Int): String =
      s"('0x' || substr(md5(h || ':$seed'), 1, 15))::BIGINT % $mBitsDefault"

    /** (doc_id, h=md5 of each 10-token segment), one row per segment. */
    def segmentHashesOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("nseg",
        ceil(size(col("toks")) / lit(segLen.toDouble)).cast("int"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, nseg), p -> " +
          s"concat_ws(' ', slice(toks, (p - 1) * $segLen + 1, $segLen)))"))
        .as("seg"))
      .select(col("doc_id"), md5(col("seg")).as("h"))

    /** Sketch of a segment-hash set: (w, word) rows, <= mBits/32 of
      * them. bit_or-merging two sketches on w yields exactly the sketch
      * of the union of their inputs — the incremental-ingest property.
      */
    def sketchOf(hashes: DataFrame, mBits: Int = mBitsDefault): DataFrame =
      hashes
        .select(explode(array(seeds.map(k => expr(posExpr(k, mBits))): _*))
          .as("pos"))
        .groupBy((col("pos") / 32).cast("int").as("w"))
        .agg(expr("bit_or(shiftleft(cast(1 as bigint), " +
          "cast(pos % 32 as int)))").as("word"))

    /** Probe a batch's (doc_id, h) segment hashes against a broadcast
      * sketch: 3 positions per segment, a segment hits iff all 3 bits
      * are set. Returns (doc_id, h, bloom_hit) — the
      * [[graft.api.Graft.bloomScreen]] facade path; the d13 gate
      * exact-verifies the hit minority on top of this.
      */
    /** Probe verdicts per (doc_id, h): hit iff EVERY seed position's
      * bit is set. The broadcast side is picked by the ONE size known
      * exactly at plan time — the sketch holds ≤ mBits/32 word rows,
      * so a small sketch (≤ 2^24 bits ≈ 512k rows / a few MB,
      * covering the 2^20 conf default and every small store)
      * broadcasts as it always did. Past that the plan carries NO
      * hint and AQE picks the build side from the RUNTIME sizes:
      * neither side is statically safe to force — the round-13
      * auto-sized store sketches reach 2^28 bits (~50 MB — the
      * ScreenBench wall regression that first flipped the hint), and
      * the batch side is only small on the SCREEN paths (≤ 3 distinct
      * positions per key, batch fenced at 1M keys); on d13-style
      * incremental ingest the probed batch is a corpus-scale fraction
      * whose position table can reach hundreds of MB, where a forced
      * batch broadcast OOMs exactly like the forced sketch broadcast
      * did. Sparse word tables (only non-zero words stored) are
      * handled by counting: a position whose word row is absent
      * matches nothing, so got < need ⇒ miss — exactly the old
      * left-join-null ⇒ false semantics.
      */
    val broadcastableSketchBits: Int = 1 << 24
    def probe(batchSegs: DataFrame, sketch: DataFrame,
              mBits: Int = mBitsDefault): DataFrame = {
      // distinct: two seeds landing on one position must count once
      // in BOTH `need` and `got`; lazy localCheckpoint so the md5
      // position derivation runs once for the two consumers
      val pos = batchSegs
        .select(col("doc_id"), col("h"),
          explode(array(seeds.map(k => expr(posExpr(k, mBits))): _*))
            .as("pos"))
        .withColumn("w", (col("pos") / 32).cast("int"))
        .withColumn("mask", expr(
          "shiftleft(cast(1 as bigint), cast(pos % 32 as int))"))
        .select(col("doc_id"), col("h"), col("w"), col("mask"))
        .distinct()
      // ONE aggregation over a LEFT join: `need` counts the key's
      // distinct positions, `got` the subset whose bit is set (an
      // absent word row ⇒ null word ⇒ not counted — the sparse-table
      // semantics). The previous shape aggregated need and got
      // separately and joined them back — two extra shuffles of the
      // position table per probe (guide §2.4), and the lazy
      // localCheckpoint that deduplicated the two consumers goes with
      // them.
      (if (mBits <= broadcastableSketchBits)
          pos.join(broadcast(sketch), Seq("w"), "left")
        else pos.join(sketch, Seq("w"), "left"))
        .groupBy(col("doc_id"), col("h"))
        .agg(count(lit(1)).as("need"),
          count(when(expr("(word & mask) = mask"), 1)).as("got"))
        .select(col("doc_id"), col("h"),
          (col("got") === col("need")).as("bloom_hit"))
    }
  }

  /** The d13 report tail — exact-verify ONLY the bloom-hit minority
    * against the live corpus segments, then the per-doc counts frame.
    * Shared by d13 (live sketch) and d21 (the same sketch through a
    * save → publish → loadCurrent seam), so the two gates can only
    * differ by where the sketch came from.
    */
  private def bloomScreenReport(probes: DataFrame,
                                corpusSegs: DataFrame): DataFrame = {
    val verified = probes.filter(col("bloom_hit"))
      .join(corpusSegs.withColumn("in_corpus", lit(true)), Seq("h"), "left")
      .select(col("doc_id"), col("h"),
        coalesce(col("in_corpus"), lit(false)).as("confirmed"))
    probes
      .join(verified.select(col("doc_id"), col("h"), col("confirmed")),
        Seq("doc_id", "h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_distinct_segments"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("confirmed") === true, 1L).otherwise(0L))
          .as("n_confirmed_dups"),
        sum(when(col("confirmed") === false, 1L).otherwise(0L))
          .as("n_false_positives"))
      .withColumn("dup_frac",
        round(col("n_confirmed_dups") /
          col("n_distinct_segments").cast("double"), 4))
      .select(col("doc_id"), col("n_distinct_segments"),
        col("n_bloom_hits"), col("n_confirmed_dups"),
        col("n_false_positives"), col("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val d13BloomIncremental: QueryDef = {
    import BloomSketch._
    QueryDef(
      "d13_bloom_incremental",
      (s, d) => {
        val mBits = mBitsOf(s)
        val docs = Tables.documents(s, d)
        val corpusSegs = segmentHashesOf(docs.filter(col("doc_id") % 5 < 4))
          .select("h").distinct()
        // sketch build: one narrow shuffle onto <= mBits/32 word rows
        val sketch = sketchOf(corpusSegs, mBits)
        val batchSegs = segmentHashesOf(docs.filter(col("doc_id") % 5 === 4))
        // probe: 3 rows per segment against the broadcast word table
        // (shared with the Graft.bloomScreen facade); exact verify
        // only the bloom-hit minority (the shared report tail)
        bloomScreenReport(probe(batchSegs, sketch, mBits), corpusSegs)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks,
             |    cast(ceil(len(string_split(text, ' ')) / $segLen.0) AS INT) AS nseg
             |  FROM documents),
             |segs AS (
             |  SELECT doc_id, md5(array_to_string(
             |    toks[((pos - 1) * $segLen + 1):((pos - 1) * $segLen + $segLen)],
             |    ' ')) AS h
             |  FROM (SELECT doc_id, toks,
             |          unnest(generate_series(1, nseg)) AS pos FROM base)),
             |corpus AS (SELECT DISTINCT h FROM segs WHERE doc_id % 5 < 4),
             |cpos AS (
             |  ${seeds.map(k => s"SELECT ${posSql(k)} AS pos FROM corpus")
                  .mkString("\n             |  UNION ALL\n             |  ")}),
             |sketch AS (
             |  SELECT cast(pos // 32 AS INT) AS w,
             |    bit_or(1::BIGINT << cast(pos % 32 AS INT)) AS word
             |  FROM cpos GROUP BY 1),
             |bsegs AS (SELECT doc_id, h FROM segs WHERE doc_id % 5 = 4),
             |bpos AS (
             |  ${seeds.map(k => s"SELECT doc_id, h, ${posSql(k)} AS pos FROM bsegs")
                  .mkString("\n             |  UNION ALL\n             |  ")}),
             |probes AS (
             |  SELECT p.doc_id, p.h,
             |    bool_and(coalesce((s.word & (1::BIGINT << cast(p.pos % 32 AS INT)))
             |      = (1::BIGINT << cast(p.pos % 32 AS INT)), false)) AS bloom_hit
             |  FROM bpos p LEFT JOIN sketch s ON s.w = cast(p.pos // 32 AS INT)
             |  GROUP BY p.doc_id, p.h),
             |verified AS (
             |  SELECT p.doc_id, p.h, (c.h IS NOT NULL) AS confirmed
             |  FROM probes p LEFT JOIN corpus c ON c.h = p.h
             |  WHERE p.bloom_hit)
             |SELECT p.doc_id,
             |  count(*) AS n_distinct_segments,
             |  cast(sum(CASE WHEN p.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_bloom_hits,
             |  cast(sum(CASE WHEN v.confirmed THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_confirmed_dups,
             |  cast(sum(CASE WHEN v.confirmed = false THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_false_positives,
             |  round(sum(CASE WHEN v.confirmed THEN 1 ELSE 0 END)
             |        / (count(*) * 1.0), 4) AS dup_frac
             |FROM probes p
             |LEFT JOIN verified v ON v.doc_id = p.doc_id AND v.h = p.h
             |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin))
  }

  /** Cross-source overlap audit: exact pairwise Jaccard between the
    * distinct-shingle SETS of every source pair — the corpus-level
    * number a dataset curator reads before mixing sources (high overlap
    * → one source is a scrape/mirror of another and the mixture
    * double-counts it). Shingles come from the same [[shingleArraysOf]]
    * definition as every other dedup op, keyed by `source`.
    *
    * Scale shape: distinct-per-source collapses each source's shingle
    * multiset to a set BEFORE any join, so the inverted self-join's
    * fan-out per shingle is bounded by (#sources choose 2) — a
    * structural cap, independent of corpus size, unlike d03's per-DOC
    * join where a hot shingle fans out quadratically in matching docs.
    * Everything after the one shuffle on shingle is #sources²-sized and
    * broadcast.
    */
  val d14SourceOverlap = QueryDef(
    "d14_source_overlap",
    (s, d) => {
      val ssh = shingleArraysOf(
          Tables.documents(s, d).select(col("source"), col("text")), "source")
        .select(col("source"), explode(col("sh")).as("sh1"))
        .distinct()
      val cnt = ssh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val common = ssh.select(col("source").as("sa"), col("sh1"))
        .join(ssh.select(col("source").as("sb"), col("sh1")), Seq("sh1"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("c"))
      val pairs = cnt.select(col("source").as("source_a"), col("n").as("n_a"))
        .join(broadcast(cnt.select(col("source").as("source_b"), col("n").as("n_b"))),
          col("source_a") < col("source_b"))
      pairs
        .join(broadcast(common),
          col("source_a") === col("sa") && col("source_b") === col("sb"), "left")
        .withColumn("n_common", coalesce(col("c"), lit(0L)))
        .select(col("source_a"), col("source_b"), col("n_common"),
          col("n_a"), col("n_b"),
          round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6)
            .as("jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH words AS (SELECT source, string_split(text, ' ') w
           |               FROM documents WHERE len(string_split(text, ' ')) >= 3),
           |ssh AS (SELECT DISTINCT source,
           |          unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           |                  for i in generate_series(1, len(w)-2)]) s
           |        FROM words),
           |cnt AS (SELECT source, count(*) n FROM ssh GROUP BY 1),
           |common AS (SELECT a.source sa, b.source sb, count(*) c
           |           FROM ssh a JOIN ssh b ON a.s = b.s AND a.source < b.source
           |           GROUP BY 1, 2)
           |SELECT p.sa AS source_a, p.sb AS source_b,
           |  cast(coalesce(c, 0) AS BIGINT) AS n_common,
           |  cast(p.na AS BIGINT) AS n_a, cast(p.nb AS BIGINT) AS n_b,
           |  round(coalesce(c, 0) * 1.0 / (p.na + p.nb - coalesce(c, 0)), 6)
           |    AS jaccard
           |FROM (SELECT a.source sa, a.n na, b.source sb, b.n nb
           |      FROM cnt a JOIN cnt b ON a.source < b.source) p
           |LEFT JOIN common ON p.sa = common.sa AND p.sb = common.sb
           |ORDER BY source_a, source_b""".stripMargin))

  /** Fuzzy cross-corpus decontamination: every TRAINING document that
    * near-duplicates a BENCHMARK document at Jaccard ≥ 0.5 — the fuzzy
    * complement of t08's exact n-gram contamination screen, and the
    * decontamination step a training pipeline runs before release (Lee
    * et al. 2022 §6.2 discuss train/eval overlap as a dedup problem).
    * The benchmark split here is `doc_id % 10 == 0`, a stand-in eval
    * set at ~10% of the corpus.
    *
    * Scale shape — the ASYMMETRY is the whole point, and what makes
    * this a different operator from d04: benchmarks are KBs–MBs while
    * the corpus is 100 TB, so the benchmark side's band buckets are
    * explicitly `broadcast()` and the corpus streams through a
    * broadcast hash join — the corpus never shuffles for candidate
    * generation (d04's bucket SELF-join must shuffle both sides).
    * Banding is 32 bands × 2 rows over the same 64 minhashes as d04:
    * at the J=0.5 threshold recall is 1-(1-s²)³² ≈ 0.9999 (16×4
    * banding would only reach ~0.64 there), and candidates are
    * exact-Jaccard verified against the broadcast benchmark shingle
    * arrays, so with the fixed seed the output equals the exact
    * cross-corpus answer (validated against the oracle at all three
    * scale factors).
    */
  /** d15's signature step over any shingle-array frame (doc_id, sh):
    * 64 xxhash64-seeded minhashes. Shared by the batch gate and the
    * streaming at-ingest screen so both sides hash identically by
    * construction.
    */
  private[graft] def d15Sigs(docsSh: DataFrame): DataFrame = {
    val numHashes = 64
    val prime = 2038074743L
    docsSh.select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
      graft.functions.MinHashArray.minhash_array(
        expr(s"transform(sh, x -> pmod(xxhash64(x), ${prime}L))"),
        numHashes, 42L, prime).as("sig"))
  }

  /** d15's screen: banded broadcast candidate join + exact-Jaccard
    * verify of `train` against the (small, broadcast) `bench` side —
    * both [[d15Sigs]] frames. Unsorted; the gate adds its output sort.
    */
  private[graft] def decontScreen(train: DataFrame, bench: DataFrame,
                                  threshold: Double = 0.5): DataFrame = {
    val bands = 32
    val rowsPerBand = 64 / bands
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        hash(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand)).as("sig"))
    }
    def buckets(df: DataFrame, as: String) =
      df.select(col("doc_id").as(as),
        explode(array(bandCols: _*)).as("bucket"))
    val cand = buckets(train, "train_id")
      .join(broadcast(buckets(bench, "bench_id")), Seq("bucket"))
      .select(col("train_id"), col("bench_id")).distinct()
    cand
      .join(train.select(col("doc_id").as("train_id"), col("sh").as("sha"),
        col("n").as("na")), Seq("train_id"))
      .join(broadcast(bench.select(col("doc_id").as("bench_id"),
        col("sh").as("shb"), col("n").as("nb"))), Seq("bench_id"))
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("c") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("train_id"), col("bench_id"), col("jaccard"))
  }

  val d15CrossDecontamination = QueryDef(
    "d15_cross_decontamination",
    (s, d) => {
      val docs = d15Sigs(shingleArrays(s, d))
      // spark.graft.benchMaxDocId (optional) caps which doc_ids can be
      // benchmarks — the DEPLOYMENT shape, where the eval set is fixed
      // while the corpus grows. ScaleBench sets it to the base-table id
      // range so replicas enlarge only the training side (a benchmark
      // that grew 100× with the corpus would not be a benchmark). Unset
      // (the gated default, and a no-op whenever all ids are below the
      // cap) every doc_id % 10 == 0 document is eval.
      val isBench = s.conf.getOption("spark.graft.benchMaxDocId") match {
        case Some(mx) => col("doc_id") % 10 === 0 && col("doc_id") <= mx.toLong
        case None     => col("doc_id") % 10 === 0
      }
      val bench = docs.filter(isBench).localCheckpoint(eager = false)
      val train = docs.filter(!isBench)
      // decontScreen IS the Graft.decontaminate facade body (the facade
      // sigs each raw side itself; the gate sigs once and filters, the
      // per-row sig being identical either way — GraftApiSpec proves
      // facade-on-raw-frames ≡ this gate)
      decontScreen(train, bench)
        .orderBy(col("train_id"), col("bench_id"))
    },
    Some(s"""WITH $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id train_id, b.doc_id bench_id, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s
            |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
            |  GROUP BY 1, 2)
            |SELECT train_id, bench_id,
            |  round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
            |FROM common JOIN cnt x ON train_id = x.doc_id
            |JOIN cnt y ON bench_id = y.doc_id
            |WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5
            |ORDER BY train_id, bench_id""".stripMargin))

  /** Quality-ARGMAX cluster survivor — the other canonicalization
    * policy a dedup pipeline ships: instead of d06/d07's min-doc_id
    * survivor, each near-dup cluster keeps its HIGHEST-QUALITY member
    * (the d07 quality signal; ties break to the lower doc_id via an
    * explicit window, so the argmax is deterministic on both engines —
    * the per-row quality arithmetic is division/multiplication only,
    * no sums, hence bit-identical cross-engine). Reuses the memoized
    * d06 cluster labels, so running d06+d07+d16 in one job still runs
    * connected components once. Scale: the labels are the d06 cost;
    * on top of them this is one window over clusters (tiny groups by
    * construction) — no new corpus-sized shuffle beyond the label join.
    */
  val d16QualityKeeper = QueryDef(
    "d16_quality_keeper",
    (s, d) => {
      val clusters = clusterLabels(s, d)
        .withColumnRenamed("doc_id", "cdoc")
      val quality = qualityScored(s, d)
      val joined = quality
        .join(clusters, quality("doc_id") === clusters("cdoc"), "left")
        .select(col("doc_id"),
          coalesce(col("canonical_id"), col("doc_id")).as("cluster_id"),
          col("q"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("q").desc, col("doc_id"))
      joined.withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("cluster_id"), (col("rn") === 1).as("keep"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $shinglesSql,
            |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
            |common AS (
            |  SELECT a.doc_id da, b.doc_id db, count(*) c
            |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2),
            |pairs AS (
            |  SELECT da, db FROM common
            |  JOIN cnt x ON da = x.doc_id JOIN cnt y ON db = y.doc_id
            |  WHERE round(c * 1.0 / (x.n + y.n - c), 4) >= 0.5),
            |edges AS (
            |  SELECT da, db FROM pairs UNION SELECT db, da FROM pairs),
            |reach(src, dst) AS (
            |  SELECT da, db FROM edges
            |  UNION
            |  SELECT r.src, e.db FROM reach r JOIN edges e ON r.dst = e.da
            |  WHERE r.src <> e.db),
            |canon AS (
            |  SELECT src AS doc_id, least(src, min(dst)) AS canonical_id
            |  FROM reach GROUP BY src),
            |quality AS (
            |  SELECT doc_id,
            |    ((length(text) - len(string_split(text, ' ')) + 1.0)
            |      / len(string_split(text, ' '))) * 0.2 +
            |    (len(list_distinct(string_split(text, ' ')))
            |      * 1.0 / len(string_split(text, ' '))) * 0.8 AS q
            |  FROM documents),
            |j AS (
            |  SELECT quality.doc_id,
            |    coalesce(canon.canonical_id, quality.doc_id) AS cluster_id, q
            |  FROM quality LEFT JOIN canon ON quality.doc_id = canon.doc_id)
            |SELECT doc_id, cluster_id,
            |  (row_number() OVER (PARTITION BY cluster_id
            |     ORDER BY q DESC, doc_id) = 1) AS keep
            |FROM j ORDER BY doc_id""".stripMargin))

  /** d17's body — the [[graft.api.Graft.semanticDecontaminate]] facade
    * path: SEMANTIC cross-corpus decontamination, d15's asymmetric
    * shape in embedding space. Lexical decontamination (d15) misses a
    * paraphrased benchmark; the embedding-cosine screen catches what
    * shingles can't. The benchmark side is tiny and BROADCAST; the
    * training corpus streams through one broadcast nested-loop pass
    * (non-equi by construction — there is no key; at 100 TB this is
    * one linear scan of the corpus against an in-memory benchmark
    * matrix, the exact shape a GPU-batched production screen also
    * has). Threshold compares the RAW double cosine (the e02
    * convention — both engines compute the same index-ordered sum);
    * output rounds to 6dp. Unsorted.
    */
  private[graft] def semanticDecontScreen(train: DataFrame,
                                          bench: DataFrame,
                                          threshold: Double): DataFrame = {
    import graft.functions.GraftFunctions.cosine_similarity
    train.select(col("vec_id").as("train_id"), col("embedding").as("t_emb"))
      .join(broadcast(bench.select(col("vec_id").as("bench_id"),
        col("embedding").as("b_emb"))))
      .withColumn("cos", cosine_similarity(col("t_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .select(col("train_id"), col("bench_id"),
        round(col("cos"), 6).as("cos"))
  }

  val d17SemanticDecontamination = QueryDef(
    "d17_semantic_decontamination",
    (s, d) => {
      val e = Tables.embeddings(s, d)
      // the d15 eval-split convention: every vec_id % 10 == 0 is eval;
      // spark.graft.benchMaxDocId (optional) pins the benchmark to the
      // base id range — the deployment shape ScaleBench measures, where
      // replicas grow only the screened corpus (a no-op at the gate,
      // where every id is below any cap)
      val isBench = s.conf.getOption("spark.graft.benchMaxDocId") match {
        case Some(mx) => col("vec_id") % 10 === 0 && col("vec_id") <= mx.toLong
        case None     => col("vec_id") % 10 === 0
      }
      graft.api.Graft.semanticDecontaminate(
          e.filter(!isBench), e.filter(isBench))
        .orderBy(col("train_id"), col("bench_id"))
    },
    Some(s"""SELECT a.vec_id AS train_id, b.vec_id AS bench_id,
            |  round(
            |    (list_aggregate([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum')
            |     / (sqrt(list_aggregate([CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum'))
            |        * sqrt(list_aggregate([CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum')))), 6) AS cos
            |FROM embeddings a JOIN embeddings b
            |  ON a.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
            |WHERE (list_aggregate([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum')
            |       / (sqrt(list_aggregate([CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum'))
            |          * sqrt(list_aggregate([CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1,64)],'sum')))) >= 0.35
            |ORDER BY train_id, bench_id""".stripMargin))

  // ------------------------------------------------------------------
  // Durable LSH dedup index (d19) — the dedup family's analogue of the
  // vector store: persist the corpus's MinHash band index once, then
  // SCREEN arriving documents against it without ever rescanning (or
  // re-signing) the stored corpus.
  // ------------------------------------------------------------------

  /** The LSH index's universal-hash modulus — d09's, so the whole
    * signature protocol (md5-derived shingle hashes + the inlined
    * [[graft.functions.MinHashArray.coefficients]]) stays DuckDB-
    * replayable bit-for-bit: unlike d04's xxhash64 signatures, a
    * persisted index must gate its own mechanics (the screen verdict
    * is the minhash ESTIMATE, not an exact Jaccard, so there is no
    * exact answer to gate against instead).
    */
  private[graft] val lshPrime = 2038074743L

  /** (vec_id, sig) MinHash signatures over a documents frame — the
    * stored-id column is named `vec_id` so the index plugs into the
    * store's shared tombstone/delete machinery unchanged. Docs with
    * fewer than 3 tokens carry no shingles and are absent (both
    * engines' shingle CTEs agree).
    */
  private[graft] def lshSignatures(docs: DataFrame,
                                   numHashes: Int = 64): DataFrame =
    shingleArraysOf(docs)
      .select(col("doc_id").as("vec_id"),
        graft.functions.MinHashArray.minhash_array(
          expr("transform(sh, x -> pmod(cast(conv(substr(md5(x), 1, 15)," +
            s" 16, 10) as bigint), ${lshPrime}L))"),
          numHashes, 42L, lshPrime).as("sig"))

  /** (vec_id, band, bkey) band-bucket rows of a signature table —
    * d09's string keys (band id prefix + the band's signature slice),
    * so joining on `bkey` alone implies the band matches. The `band`
    * column rides along as the store's partition column (per-band
    * directories make the shard merge a per-dir rename).
    */
  private[graft] def lshBandRows(sigs: DataFrame, rowsPerBand: Int,
                                 numHashes: Int = 64): DataFrame = {
    val bands = numHashes / rowsPerBand
    val bandStructs = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws(",", lit(bnd) +: (0 until rowsPerBand).map(r =>
          col("sig").getItem(bnd * rowsPerBand + r)): _*).as("bkey"))
    }
    sigs.select(col("vec_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("vec_id"), col("b.band").as("band"),
        col("b.bkey").as("bkey"))
  }

  /** SCREEN arriving documents against a stored LSH index — the
    * at-ingest near-dup verdict: sign the batch with the shared
    * protocol, probe the stored band buckets (the incoming side is
    * BROADCAST into the join, so the stored band table never
    * shuffles — the d15/d17 asymmetric shape: at 100 TB the corpus
    * index is scanned once per batch and moves nothing), then verify
    * candidates by the MinHash similarity ESTIMATE — matching
    * signature positions / numHashes, the unbiased Jaccard estimator
    * — thresholded on the INTEGER match count (⌈n·t⌉), so both
    * engines compare integers, never rounded doubles. `bucketCap`
    * excludes stored buckets holding more than `cap` members from
    * candidate generation (d09's hot-bucket mitigation — boilerplate
    * mega-buckets are d01/d02 territory), bounding per-bucket fan-out.
    *
    * Output: (doc_id [arriving], stored_id, est_jaccard), unsorted.
    */
  /** The screens' size-contract defaults — DEFAULT-ON since round 13
    * (the round-12 opt-in left default-config users with no loud
    * fence between them and an opaque broadcast failure or a driver
    * OOM). Both are generous for real micro-batches and overridable
    * per session; both clamp below Int.MaxValue so a huge override
    * degrades to the largest enforceable bound instead of an integer
    * overflow turning the guard into a confusing limit() failure.
    */
  private[graft] val MaxScreenBatchRowsDefault = 1000000L
  private[graft] val MaxScreenCandidatesDefault = 1000000L

  private def boundedConf(spark: SparkSession, key: String,
                          default: Long): Int = {
    val v = spark.conf.getOption(key).map(_.toLong).getOrElse(default)
    require(v >= 1, s"$key must be >= 1, got $v")
    math.min(v, Int.MaxValue.toLong - 1).toInt
  }

  /** ENFORCE the screens' documented batch-size contract
    * (`spark.graft.maxScreenBatchRows`, default
    * [[MaxScreenBatchRowsDefault]]): the incoming batch BROADCASTS to
    * every executor, so an oversized batch must fail LOUDLY at a
    * named boundary — this check — rather than deep in Spark's
    * broadcast machinery (whose 8 GB/512M-row ceilings surface as
    * opaque executor errors). Costs one early-stopping count of the
    * batch per screen; the streaming surfaces bound batches
    * naturally, so the fence exists for batch sizing outside the
    * caller's control.
    */
  private[graft] def enforceScreenBatchContract(batch: DataFrame,
                                                what: String): Unit = {
    val max = boundedConf(batch.sparkSession,
      "spark.graft.maxScreenBatchRows", MaxScreenBatchRowsDefault)
    if (batch.limit(max + 1).count() > max)
      throw new IllegalStateException(
        s"$what batch exceeds spark.graft.maxScreenBatchRows=$max: " +
          "the incoming side of a screen BROADCASTS to every " +
          "executor by the size contract — an oversized batch " +
          "would fail at the broadcast (or OOM) instead; split " +
          "the input into bounded micro-batches (the streaming " +
          "surfaces do this naturally), or raise the conf if your " +
          "executors can hold a bigger broadcast")
  }

  private[graft] def lshScreenOf(storedSigs: DataFrame,
                                 storedBands: DataFrame,
                                 newDocs: DataFrame, threshold: Double,
                                 rowsPerBand: Int,
                                 bucketCap: Option[Int] = None,
                                 numHashes: Int = 64,
                                 probeBuckets: Int = 0,
                                 bkeyBloom: Option[(DataFrame, Int)] = None)
      : DataFrame = {
    enforceScreenBatchContract(newDocs, "lsh screen")
    // lazy localCheckpoint: the batch's signatures feed banding AND
    // the verify join; blocks die with the handle (ContextCleaner)
    val inSigs = lshSignatures(newDocs, numHashes)
      .localCheckpoint(eager = false)
    val inBandsAll = lshBandRows(inSigs, rowsPerBand, numHashes)
      .select(col("vec_id").as("new_id"), col("bkey"))
    // BLOOM PREFILTER (stored sketch over the index's band keys): an
    // incoming bkey the sketch rejects provably matches NO stored
    // bucket (no false negatives), so its band row drops BEFORE any
    // store I/O — a batch of novel documents costs its own signing
    // plus a broadcast sketch probe and touches (almost) nothing
    // stored. False positives only add probes; verdicts are
    // UNCHANGED by construction (LshIndexSpec pins it).
    val inBands = bkeyBloom.fold(inBandsAll) { case (words, mBits) =>
      val keep = BloomSketch.probe(
          inBandsAll.select(col("new_id").as("doc_id"),
            col("bkey").as("h")).distinct(), words, mBits)
        .filter(col("bloom_hit"))
        .select(col("doc_id").as("new_id"), col("h").as("bkey"))
      inBandsAll.join(broadcast(keep), Seq("new_id", "bkey"))
    }
    def candOf(bands: DataFrame): DataFrame = {
      val sBands = bucketCap.fold(bands) { cap =>
        // one map-side-combined count; hot buckets never reach the
        // join. On the pruned path the count runs over the pruned
        // table — exact for every probed bkey, whose full population
        // shares its bucket value and so survives the prune
        val cool = bands.groupBy(col("bkey"))
          .agg(count(lit(1)).as("bn")).filter(col("bn") <= cap)
          .select(col("bkey"))
        bands.join(cool, Seq("bkey"))
      }
      sBands.join(broadcast(inBands), Seq("bkey"))
        .select(col("new_id"), col("vec_id").as("stored_id"))
        .distinct()
    }
    // PROBE PRUNING (bucketed stores): the batch's band keys derive
    // their bucket values with the store's own expression — pmod(hash
    // (bkey), n) — and the literal set (≤ n ints, pulled driver-side
    // from the SMALL batch side only) filters the stored band table on
    // its partition column. Catalyst pushes the filter through the
    // tombstone mask to the scan as a PartitionFilter, so the probe
    // reads only the matching buckets' FILES, and the candidate pairs
    // (small by the size contract — bucket collisions only; the
    // unpruned path broadcasts the same set) pull driver-side WITH
    // their sig-table buckets, so the verify scan prunes to the
    // candidates' sb dirs and the band table is probed exactly ONCE
    // per screen. Per-batch screen I/O is O(batch's buckets), not
    // O(index). Correctness is containment: any stored row sharing a
    // probe key with the batch has the same bucket value by
    // construction, so pruning removes only non-candidates.
    val (cand, prunedSigs) =
      if (probeBuckets > 0 && storedBands.columns.contains("bb") &&
          storedSigs.columns.contains("sb")) {
        val bbs = inBands
          .select(pmod(hash(col("bkey")), lit(probeBuckets)).as("bb"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val prunedBands =
          if (bbs.isEmpty) storedBands.filter(lit(false))
          else storedBands.filter(col("bb").isInCollection(bbs))
        // GUARDED pull: the candidate set is O(batch band keys ×
        // stored-bucket population) — bounded on every healthy store,
        // but a hot bucket (millions of near-identical stored docs)
        // would otherwise materialize on the driver as an OOM. The
        // limit bounds what the driver ever holds (one pass — not a
        // count-then-collect), and overflow fails at a NAMED boundary
        // that says which lever to pull.
        val spark = storedSigs.sparkSession
        val maxCand = boundedConf(spark,
          "spark.graft.maxScreenCandidates", MaxScreenCandidatesDefault)
        val pulled = candOf(prunedBands)
          .withColumn("sb", pmod(hash(col("stored_id")),
            lit(probeBuckets)))
          .limit(maxCand + 1)
          .collect()
        if (pulled.length > maxCand)
          throw new IllegalStateException(
            s"lsh screen: candidate set exceeds " +
              s"spark.graft.maxScreenCandidates=$maxCand — a stored " +
              "hot bucket is fanning out against this batch. Set " +
              "bucketCap to exclude oversized buckets from candidate " +
              "generation (boilerplate mega-buckets are exact dedup's " +
              "job), raise the conf if the driver can hold more, or " +
              "compact away hyper-duplicated ids first.")
        import spark.implicits._
        val localCand = pulled.map(r => (r.getLong(0), r.getLong(1)))
          .toSeq.toDF("new_id", "stored_id")
        val sbs = pulled.map(_.getInt(2)).distinct.toSeq
        val sigsPr =
          if (sbs.isEmpty) storedSigs.filter(lit(false))
          else storedSigs.filter(col("sb").isInCollection(sbs))
        (localCand, sigsPr)
      } else (candOf(storedBands), storedSigs)
    val minMatches = math.ceil(numHashes * threshold).toInt
    // verify: candidates (small — bucket collisions only) broadcast
    // against the stored signature table; the estimate is a pure
    // in-row fold over the two 64-long arrays
    val withNew = cand.join(broadcast(
      inSigs.select(col("vec_id").as("new_id"), col("sig").as("sa"))),
      Seq("new_id"))
    prunedSigs.select(col("vec_id").as("stored_id"), col("sig").as("sb"))
      .join(broadcast(withNew), Seq("stored_id"))
      .withColumn("cm", expr(
        "aggregate(zip_with(sa, sb, (x, y) -> " +
          "CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)"))
      .filter(col("cm") >= minMatches)
      .select(col("new_id").as("doc_id"), col("stored_id"),
        round(col("cm") / lit(numHashes.toDouble), 4).as("est_jaccard"))
  }

  /** Durable LSH screen gate — e30's restart seam for the DEDUP
    * family: build the band index over the stored corpus
    * (doc_id % 3 ≠ 0), save it, reopen a FRESH handle
    * ([[graft.api.Graft.loadLshIndex]] — no re-signing), and screen
    * the arriving docs (% 3 = 0) against it. Oracle: the full
    * mechanics replay — d09's md5-derived signature protocol with the
    * universal-hash coefficients inlined as literals, string band
    * keys, the bucket join, and the integer match-count verify — so
    * the gate pins signatures, banding, candidate generation, AND the
    * estimate arithmetic of the loaded index cross-engine (cm/64 is
    * an exact binary fraction; the 4dp round cannot straddle).
    */
  val d19LshIndexScreen = QueryDef(
    "d19_lsh_index_screen",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_d19_lsh").toString
      graft.api.Graft.lshIndex(docs.filter(col("doc_id") % 3 =!= 0))
        .save(dir)
      graft.api.Graft.loadLshIndex(s, dir)
        .screen(docs.filter(col("doc_id") % 3 === 0))
        .orderBy(col("doc_id"), col("stored_id"))
    },
    Some {
      val (a, b) = graft.functions.MinHashArray.coefficients(64, 42L)
      val sigCols = (0 until 64)
        .map(k => s"min((h * ${a(k)} + ${b(k)}) % $lshPrime) AS m$k")
        .mkString(",\n    ")
      val bandCases = (0 until 16).map { bnd =>
        val parts = (0 until 4).map(r => s"m${bnd * 4 + r}")
          .mkString(" || ',' || ")
        s"WHEN $bnd THEN '$bnd,' || $parts"
      }.mkString("\n      ")
      val matchSum = (0 until 64)
        .map(k => s"CASE WHEN x.m$k = y.m$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $shinglesSql,
         |hashes AS (
         |  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % $lshPrime AS h
         |  FROM sh),
         |sig AS (
         |  SELECT doc_id,
         |    $sigCols
         |  FROM hashes GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id,
         |    CASE band
         |      $bandCases
         |    END AS bkey
         |  FROM sig, (SELECT unnest(generate_series(0, 15)) AS band) tb),
         |cand AS (
         |  SELECT DISTINCT i.doc_id AS new_id, st.doc_id AS stored_id
         |  FROM bands i JOIN bands st ON i.bkey = st.bkey
         |  WHERE i.doc_id % 3 = 0 AND st.doc_id % 3 <> 0),
         |est AS (
         |  SELECT c.new_id, c.stored_id, ($matchSum) AS cm
         |  FROM cand c
         |  JOIN sig x ON x.doc_id = c.new_id
         |  JOIN sig y ON y.doc_id = c.stored_id)
         |SELECT new_id AS doc_id, stored_id,
         |  round(cm / 64.0, 4) AS est_jaccard
         |FROM est WHERE cm >= 52
         |ORDER BY doc_id, stored_id""".stripMargin
    })

  /** Blue/green publish gate for the DEDUP kind — d19's screen run
    * THROUGH the generation pointer: publish a stale index (one third
    * of the stored corpus) as generation 1, the full stored corpus as
    * generation 2, then screen via [[graft.api.Graft
    * .loadCurrentLshIndex]]. Oracle: d19's closed-form replay
    * verbatim — the publish seam (renames + markers + the listing
    * resolve) must be invisible to the verdicts, and the stale
    * generation 1 must NOT leak into them (its missing stored docs
    * would drop pairs, failing the row compare).
    */
  val d20LshPublishedScreen = QueryDef(
    "d20_lsh_published_screen",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val root = java.nio.file.Files
        .createTempDirectory("graft_d20_root").toString + "/gens"
      val b1 = java.nio.file.Files
        .createTempDirectory("graft_d20_b1").toString + "/idx"
      graft.api.Graft.lshIndex(docs.filter(col("doc_id") % 3 === 1))
        .save(b1)
      graft.api.Graft.publishIndex(s, root, b1)
      val b2 = java.nio.file.Files
        .createTempDirectory("graft_d20_b2").toString + "/idx"
      graft.api.Graft.lshIndex(docs.filter(col("doc_id") % 3 =!= 0))
        .save(b2)
      graft.api.Graft.publishIndex(s, root, b2)
      graft.api.Graft.loadCurrentLshIndex(s, root)
        .screen(docs.filter(col("doc_id") % 3 === 0))
        .orderBy(col("doc_id"), col("stored_id"))
    },
    d19LshIndexScreen.oracle)

  /** Blue/green publish gate for the BLOOM kind — d13's incremental
    * screen run THROUGH the generation pointer, completing the
    * publish-flip oracle coverage across all four screening kinds
    * (d20 = LSH, e50 = IVF, e51 = BM25, this = the exact-segment
    * sketch — the kind whose "forget" path IS rebuild + publish,
    * since a bit_or sketch can only grow). Publish a stale sketch
    * (half the stored corpus) as generation 1, d13's full corpus
    * sketch as generation 2, then probe via [[graft.api.Graft
    * .loadCurrentBloomIndex]] + [[graft.api.Graft.bloomScreen]] and
    * report through the shared [[bloomScreenReport]] tail. Oracle:
    * d13's text verbatim — the save → publish → loadCurrent seam must
    * be invisible to every count (a sketch is bit-exact under the
    * parquet round-trip), and the stale generation 1 must NOT leak
    * (its missing segments would flip bloom_hit verdicts, failing the
    * hash compare).
    */
  val d21BloomPublishedScreen: QueryDef = {
    import BloomSketch._
    QueryDef(
      "d21_bloom_published_screen",
      (s, d) => {
        val mBits = mBitsOf(s)
        val docs = Tables.documents(s, d)
        val root = java.nio.file.Files
          .createTempDirectory("graft_d21_root").toString + "/gens"
        val corpusSegs = segmentHashesOf(docs.filter(col("doc_id") % 5 < 4))
          .select("h").distinct()
        val b1 = java.nio.file.Files
          .createTempDirectory("graft_d21_b1").toString + "/idx"
        graft.api.Graft.bloomSketch(
          segmentHashesOf(docs.filter(col("doc_id") % 5 < 2)), mBits)
          .save(b1)
        graft.api.Graft.publishIndex(s, root, b1)
        val b2 = java.nio.file.Files
          .createTempDirectory("graft_d21_b2").toString + "/idx"
        graft.api.Graft.bloomSketch(
          segmentHashesOf(docs.filter(col("doc_id") % 5 < 4)), mBits)
          .save(b2)
        graft.api.Graft.publishIndex(s, root, b2)
        val probes = graft.api.Graft.bloomScreen(
          docs.filter(col("doc_id") % 5 === 4),
          graft.api.Graft.loadCurrentBloomIndex(s, root))
        bloomScreenReport(probes, corpusSegs)
      },
      d13BloomIncremental.oracle)
  }

  def all: Seq[QueryDef] = Seq(
    d01ExactDedup, d02NormalizedDedup, d03NgramJaccard, d04MinHashLsh,
    d05SimHash, d06DedupClusters, d07KeepList, d08JaccardCapped,
    d09MinHashCapped, d10SegmentDedup, d11IntraDocDedup, d12SubstringDedup,
    d13BloomIncremental, d14SourceOverlap, d15CrossDecontamination,
    d16QualityKeeper, d17SemanticDecontamination, d18ClustersCapped,
    d19LshIndexScreen, d20LshPublishedScreen, d21BloomPublishedScreen)
}
