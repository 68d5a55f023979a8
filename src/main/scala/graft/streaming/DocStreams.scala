package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming document transforms — the streaming counterparts of the
  * batch dedup surface, with state bounded by the watermark (the only
  * form of dedup state that survives an unbounded stream).
  */
object DocStreams {

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  /** One (document, band) hit from [[nearDupCandidates]]: `first_doc`
    * is the document that first claimed this MinHash band bucket within
    * the watermark horizon; `is_dup_candidate` marks a later document
    * hashing into the same bucket — d04's candidate-pair semantics,
    * streamed. A document flagged in ≥1 band is a near-dup CANDIDATE;
    * exact verification (d04's `array_intersect` step) stays a batch
    * join over the flagged minority.
    */
  final case class BandHit(doc_id: Long, bkey: String, first_doc: Long,
                           is_dup_candidate: Boolean)

  /** Keyed state for [[nearDupCandidates]]: the current claimant of a
    * band bucket, the claimant's own event time (so a claimant older
    * than the horizon can be demoted — a continuously-hot bucket must
    * not pin its original claimant forever), and the newest event time
    * seen (drives the timeout). Public — the encoder's generated code
    * needs a visible constructor.
    */
  final case class BucketState(first_doc: Long, first_ms: Long, last_ms: Long)

  /** Streaming MinHash-LSH near-dup candidate detection — the streaming
    * counterpart of the batch d04/d09 operators. Each arriving document
    * computes its 64-hash MinHash signature IN A PROJECTION (the same
    * shingle definition and `MinHashArray` codegen'd aggregate family as
    * the batch path, same 16×4 banding), then each band key routes to
    * keyed state holding only the FIRST document that claimed the
    * bucket; later arrivals emit candidate hits against it.
    *
    * State: one (doc_id, ts) pair per DISTINCT band bucket seen within
    * the watermark horizon — evicted by EventTimeTimeout as the
    * watermark passes, so an unbounded stream holds O(buckets per
    * horizon), never O(corpus). This is exactly the boundedness
    * trade-off of `dropDuplicatesWithinWatermark`, applied to
    * LSH-bucket identity instead of exact identity: duplicates farther
    * apart than the horizon are a batch backfill's job (d04).
    */
  def nearDupCandidates(docs: Dataset[Doc],
                        horizonMinutes: Int = 10): Dataset[BandHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numHashes = 64
    val bands = 16
    val rowsPerBand = numHashes / bands
    val prime = 2038074743L

    val sigs = docs
      .withWatermark("ts", s"$horizonMinutes minutes")
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")))
      .withColumn("sig", graft.functions.MinHashArray.minhash_array(
        expr("transform(sh, x -> pmod(cast(conv(substr(md5(x), 1, 15)," +
          s" 16, 10) as bigint), ${prime}L))"),
        numHashes, 42L, prime))
    val bandKeys = (0 until bands).map { bnd =>
      concat_ws(",", lit(bnd) +: (0 until rowsPerBand).map(r =>
        col("sig").getItem(bnd * rowsPerBand + r)): _*)
    }
    val horizonMs = horizonMinutes * 60000L

    sigs
      .select(col("doc_id"), col("ts"),
        explode(array(bandKeys: _*)).as("bkey"))
      .as[(Long, Timestamp, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[BucketState, BandHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (bkey: String, rows: Iterator[(Long, Timestamp, String)],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within-batch order: the lowest doc_id claims
            // a fresh bucket (matches d04's min-id candidate orientation)
            val batch = rows.toSeq.sortBy(_._1)
            val newestMs = batch.map(_._2.getTime).max
            // a claimant whose own event time has aged past the horizon
            // (relative to the newest arrival) is demoted, so a
            // continuously-hot bucket can't pin candidates against an
            // arbitrarily old first_doc — "first claimant WITHIN the
            // horizon" holds even when re-armed timeouts keep the state
            val prev = state.getOption
              .filter(_.first_ms >= newestMs - horizonMs)
            val (first, firstMs) = prev
              .map(p => (p.first_doc, p.first_ms))
              .getOrElse((batch.head._1, batch.head._2.getTime))
            val lastMs = math.max(
              state.getOption.map(_.last_ms).getOrElse(0L), newestMs)
            state.update(BucketState(first, firstMs, lastMs))
            state.setTimeoutTimestamp(
              math.max(lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            batch.iterator.map { case (id, _, _) =>
              BandHit(id, bkey, first, id != first)
            }
          }
      }
  }

  /** Score an unbounded document stream with BATCH-built DSIR models
    * (t20's hashed-unigram log-ratio table, pulled driver-side via
    * [[graft.operators.TextAnalysisQueries.dsirModels]]): the ≤1024-entry
    * model rides as a literal map and the whole scorer is ONE stateless
    * projection — per-token bucket hash, map lookup (falling back to the
    * smoothed unseen-bucket ratio for out-of-corpus tokens), in-order
    * array fold — no watermark, no keyed state, no shuffle. Model
    * refresh = restart the query with a re-pulled map (models are a
    * slowly-changing batch artifact, not stream state). Agreement with
    * batch t20 on the same corpus is spec-proven (DocStreamsSpec); the
    * per-doc sum folds in document order vs the batch shuffle order,
    * which t20's float-cast-then-round protocol absorbs.
    */
  def dsirScore(docs: Dataset[Doc], logRatio: Map[Long, Double],
                unseenLr: Double, buckets: Int = 1024): DataFrame = {
    val m = typedLit(logRatio)
    docs.toDF()
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("ts"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(aggregate(
          transform(col("toks"), t =>
            coalesce(
              element_at(m, pmod(graft.operators.TextAnalysisQueries.hash60(t),
                lit(buckets.toLong))),
              lit(unseenLr))),
          lit(0.0), (acc, x) => acc + x).cast("float"), 4)
          .as("dsir_logweight"))
  }

  /** Score an unbounded document stream with the t21 hashed linear
    * quality classifier — the same inference shape as [[dsirScore]]:
    * the model is a pure projection (per-token md5 bucket → the shared
    * [[graft.operators.TextAnalysisQueries.classifierWeight]] weight,
    * in-order fold, sigmoid of the mean), so the scorer is ONE
    * stateless pass — no watermark, no keyed state, no shuffle.
    * Agreement with batch t21 is spec-proven (DocStreamsSpec): the
    * stream folds tokens in document order while the batch aggregates
    * in shuffle order, which the shared float-cast-then-round-4
    * protocol absorbs, and `keep` thresholds the ROUNDED probability
    * on both surfaces.
    */
  def qualityScore(docs: Dataset[Doc], buckets: Int = 1024): DataFrame = {
    import graft.operators.TextAnalysisQueries.{classifierWeight, hash60}
    docs.toDF()
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sw", aggregate(
        transform(col("toks"), t =>
          classifierWeight(pmod(hash60(t), lit(buckets.toLong)))),
        lit(0.0), (acc, x) => acc + x))
      .select(col("doc_id"), col("ts"),
        size(col("toks")).cast("long").as("n_tokens"),
        round((lit(1.0) / (lit(1.0)
          + exp(-col("sw") / size(col("toks")))))
          .cast("float"), 4).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= 0.5)
  }

  /** Exact-verify streamed candidates — the batch half of the streaming
    * dedup loop. Takes the collected [[nearDupCandidates]] output and
    * the corpus (doc_id, text), and runs d04's `array_intersect` exact
    * Jaccard over ONLY the flagged pairs: work is proportional to the
    * candidate minority, never corpus². Returns (da, db, jaccard) with
    * da < db and jaccard ≥ `threshold` — exactly d04's orientation and
    * rounding, so stream-candidates ∘ this ≡ the batch d04 pairs on the
    * same data (spec-proven in DocStreamsSpec); the shingle definition
    * is shared with the batch path by construction
    * ([[graft.operators.DedupQueries.shingleArraysOf]]).
    */
  def verifyCandidates(hits: DataFrame, corpus: DataFrame,
                       threshold: Double = 0.8): DataFrame = {
    val pairs = hits.filter(col("is_dup_candidate"))
      .select(least(col("first_doc"), col("doc_id")).as("da"),
              greatest(col("first_doc"), col("doc_id")).as("db"))
      .distinct()
    val sh = graft.operators.DedupQueries.shingleArraysOf(corpus)
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n"))
    pairs
      .join(sh.select(col("doc_id").as("da"), col("sh").as("sha"),
        col("n").as("na")), Seq("da"))
      .join(sh.select(col("doc_id").as("db"), col("sh").as("shb"),
        col("n").as("nb")), Seq("db"))
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("c") / (col("na") + col("nb") - col("c")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
      .orderBy(col("da"), col("db"))
  }

  /** AT-INGEST decontamination — d15 as a stream: every arriving
    * document is screened against the (small, static, broadcast)
    * benchmark index before it can enter the corpus. The screen is
    * embarrassingly per-document (a doc's verdict depends only on
    * itself and the benchmark side), so each micro-batch runs the
    * EXACT gated pipeline ([[graft.operators.DedupQueries.d15Sigs]] →
    * `decontScreen`: 32×2-banded MinHash candidates against broadcast
    * bench buckets, exact-Jaccard verify against broadcast bench
    * shingles) batch-side in foreachBatch — no stream state at all,
    * and the union of batch outputs provably equals the batch d15
    * answer for the same documents (DocStreamsSpec). `bench` is a
    * [[graft.operators.DedupQueries.d15Sigs]] frame the caller builds
    * once (and should cache — it is the slowly-changing model-table
    * side, the t20/t21 deployment pattern). At 100 TB-ingest rates the
    * per-batch cost is the batch gate's corpus-side cost on the batch
    * alone: one projection + a broadcast join — nothing shuffles.
    */
  def decontaminate(docs: Dataset[Doc], bench: DataFrame)
                   (onBatch: DataFrame => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[Doc], _: Long) =>
        val sigs = graft.operators.DedupQueries.d15Sigs(
          graft.operators.DedupQueries.shingleArraysOf(batch.toDF()))
        onBatch(graft.operators.DedupQueries.decontScreen(sigs, bench))
      }
      .start()
}
