package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.Graft

/** The durable LSH dedup index's lifecycle contract — the dedup
  * family's sibling of IndexStoreSpec: save → load → screen must equal
  * the live handle bit-for-bit (signatures are integers, the estimate
  * is an exact binary fraction), append/shard/merge/delete must
  * compose with the shared store machinery, and the at-ingest stream
  * must equal the batch screen.
  */
class LshIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lsh-index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  private def stored: DataFrame = docs.filter(col("doc_id") % 3 =!= 0)
  private def incoming: DataFrame = docs.filter(col("doc_id") % 3 === 0)

  private def tmp(): String =
    Files.createTempDirectory("graft-lsh-index").toString

  private def verdicts(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("stored_id"), r.getAs[Double]("est_jaccard"))).toSet

  test("save -> load -> screen equals the live handle bit-for-bit") {
    val live = Graft.lshIndex(stored)
    val d = tmp()
    live.save(d)
    val a = verdicts(live.screen(incoming))
    assert(a.nonEmpty, "the sf0.001 corpus must contain near-dups")
    assert(verdicts(Graft.loadLshIndex(spark, d).screen(incoming)) == a)
    // every estimate clears the integer threshold (ceil(64*0.8) = 52)
    assert(a.forall(_._3 >= 52.0 / 64))
  }

  test("saved band table is hive-partitioned by band; params round-trip") {
    val d = tmp()
    Graft.lshIndex(stored, threshold = 0.5).save(d)
    val parts = new java.io.File(s"$d/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("band="))
    // threshold 0.5 derives 32x2 banding (the round-9 curve)
    assert(parts.length == 32, s"expected 32 band dirs, got ${parts.length}")
    val loaded = Graft.loadLshIndex(spark, d)
    assert(loaded.threshold == 0.5 && loaded.rowsPerBand == 2
      && loaded.numHashes == 64)
  }

  test("append and appendDurable equal build-all-at-once; epochs logged") {
    val half1 = stored.filter(col("doc_id") % 2 === 0)
    val half2 = stored.filter(col("doc_id") % 2 =!= 0)
    val full = Graft.lshIndex(stored)
    val expect = verdicts(full.screen(incoming))

    // live append
    assert(verdicts(Graft.lshIndex(half1).append(half2).screen(incoming))
      == expect)

    // durable append through a fresh handle (the restart seam)
    val d = tmp()
    Graft.lshIndex(half1).save(d)
    Graft.loadLshIndex(spark, d).appendDurable(d, half2)
    assert(verdicts(Graft.loadLshIndex(spark, d).screen(incoming))
      == expect)
    val ops = Graft.indexEpochs(spark, d).select(col("op"))
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("save", "append"))
    // the append epoch's delta counts SIGNATURE rows (docs), not bands
    val deltas = Graft.indexEpochs(spark, d)
      .filter(col("op") === "append").select(col("n_rows"))
      .collect().map(_.getLong(0)).toSeq
    assert(deltas == Seq(graft.operators.DedupQueries
      .lshSignatures(half2).count()))
  }

  test("delete: insert-then-delete returns to never-inserted; compact applies; describe covers lsh") {
    val extraIds = incoming.select(col("doc_id").as("vec_id"))
    val base = Graft.lshIndex(stored)
    // screen a DISJOINT probe set so deleted docs appear only as
    // stored candidates: probe with the stored docs themselves
    val probe = stored.limit(50)
    val expect = verdicts(base.screen(probe))

    // live: add the incoming docs to the index, then delete them
    assert(verdicts(base.append(incoming).delete(extraIds).screen(probe))
      == expect)

    // durable: tombstones mask on load; compact applies + clears
    val d = tmp()
    base.save(d)
    Graft.loadLshIndex(spark, d).appendDurable(d, incoming)
    Graft.deleteFromIndex(spark, d, extraIds)
    assert(verdicts(Graft.loadLshIndex(spark, d).screen(probe)) == expect)
    Graft.compactIndex(spark, d)
    assert(!new java.io.File(s"$d/tombstones").exists())
    assert(verdicts(Graft.loadLshIndex(spark, d).screen(probe)) == expect)
    assert(spark.read.parquet(s"$d/sigs")
      .filter(col("vec_id") % 3 === 0).count() == 0,
      "compact must rewrite tombstoned signatures out of the files")

    val tables = Graft.describeIndex(spark, d).select(col("table"))
      .collect().map(_.getString(0)).toSet
    assert(tables == Set("sigs", "bands", "params", "bkbloom", "epochs"))
  }

  test("shard + merge equals the append path; mismatched banding params are refused") {
    val half1 = stored.filter(col("doc_id") % 2 === 0)
    val half2 = stored.filter(col("doc_id") % 2 =!= 0)
    val root = tmp()
    val idx = Graft.lshIndex(half1)
    idx.save(s"$root/main")
    idx.shard(s"$root/s1", half2)
    Graft.mergeIndex(spark, s"$root/main", s"$root/s1")
    assert(!new java.io.File(s"$root/s1").exists())
    assert(verdicts(Graft.loadLshIndex(spark, s"$root/main")
      .screen(incoming))
      == verdicts(Graft.lshIndex(stored).screen(incoming)))

    // a shard banded at a different threshold (same rows-per-band, so
    // only the params table differs) is refused before any file moves
    Graft.lshIndex(half2, threshold = 0.82).save(s"$root/other")
    val err = intercept[IllegalArgumentException] {
      Graft.mergeIndex(spark, s"$root/main", s"$root/other")
    }
    assert(err.getMessage.contains("LSH parameters"))
    assert(new java.io.File(s"$root/other/sigs").exists())

    // different rows-per-band trips the manifest size check instead
    Graft.lshIndex(half2, threshold = 0.95).save(s"$root/coarse")
    val err2 = intercept[IllegalArgumentException] {
      Graft.mergeIndex(spark, s"$root/main", s"$root/coarse")
    }
    assert(err2.getMessage.contains("size parameters"))
  }

  test("dedup-at-ingest pipeline: survivors append, cross-batch dups are caught, marked batches skip") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // identical text = est 1.0 (deterministic hit at any threshold);
    // disjoint text = zero shared shingles (deterministically no hit)
    val storedTxt = "zero one two three four five six seven eight nine"
    val aTxt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val cTxt = "red orange yellow green blue indigo violet ultra infra deep"
    val d = tmp()
    Graft.lshIndex(Seq((1L, storedTxt)).toDF("doc_id", "text")).save(d)

    val ts = java.sql.Timestamp.valueOf("2026-01-01 09:00:00")
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.DocStreams.Doc]
    val verdicts = scala.collection.mutable.Set[(Long, Long, Double)]()
    val cp = Files.createTempDirectory("graft-lsh-ingest-cp").toString
    val q = Graft.lshIngestStreamDurable(d, stream.toDS(), Some(cp)) { b =>
      verdicts.synchronized {
        verdicts ++= b.collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("stored_id"), r.getAs[Double]("est_jaccard")))
      }
    }
    // batch 1: doc 10 is novel (survives), doc 11 duplicates STORED 1
    stream.addData(graft.streaming.DocStreams.Doc(10L, ts, aTxt),
      graft.streaming.DocStreams.Doc(11L, ts, storedTxt))
    q.processAllAvailable()
    // batch 2: doc 20 duplicates batch-1 SURVIVOR 10 (cross-batch
    // visibility), doc 21 is novel
    stream.addData(graft.streaming.DocStreams.Doc(20L, ts, aTxt),
      graft.streaming.DocStreams.Doc(21L, ts, cTxt))
    q.processAllAvailable()
    q.stop()

    assert(verdicts.toSet == Set((11L, 1L, 1.0), (20L, 10L, 1.0)),
      s"wrong verdicts: $verdicts")
    // the stored corpus grew by exactly the first-seen survivors
    val storedIds = spark.read.parquet(s"$d/sigs")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 10L, 21L), s"stored: $storedIds")

    // a marked batch id is skipped: pre-mark the next id and replay
    val before = spark.read.parquet(s"$d/sigs").count()
    Files.createFile(java.nio.file.Paths.get(
      s"$cp/_graft_commits/batch-2"))
    val q2 = Graft.lshIngestStreamDurable(d, stream.toDS(), Some(cp))(_ => ())
    stream.addData(graft.streaming.DocStreams.Doc(30L, ts,
      "completely fresh words that would otherwise certainly survive here"))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(s"$d/sigs").count() == before,
      "a marked (already-committed) ingest batch was re-appended")
  }

  test("dedupWithinBatch keeps each batch-local cluster's min-id member") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seed = "zero one two three four five six seven eight nine"
    val novel = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = tmp()
    Graft.lshIndex(Seq((1L, seed)).toDF("doc_id", "text")).save(d)

    val ts = java.sql.Timestamp.valueOf("2026-01-01 09:00:00")
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.DocStreams.Doc]
    val q = Graft.lshIngestStreamDurable(d, stream.toDS(),
      dedupWithinBatch = true)(_ => ())
    // one batch: three copies of a novel doc + one dup of STORED 1;
    // within-batch clustering must keep only min-id 10, and 30 is
    // caught by the stored screen
    stream.addData(
      graft.streaming.DocStreams.Doc(10L, ts, novel),
      graft.streaming.DocStreams.Doc(11L, ts, novel),
      graft.streaming.DocStreams.Doc(12L, ts, novel),
      graft.streaming.DocStreams.Doc(30L, ts, seed))
    q.processAllAvailable()
    q.stop()
    val storedIds = spark.read.parquet(s"$d/sigs")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 10L),
      s"within-batch dedup failed: stored = $storedIds")
  }

  test("phash index: load ≡ live, append ≡ build-all, insert-then-delete ≡ never-inserted, shards merge") {
    val spark2 = spark
    import spark2.implicits._
    // deterministic synthetic hashes: near-dups differ by ≤ 4 bits
    def h(id: Long, lo: Long, hi: Long) = (id, lo, hi)
    val storedRows = Seq(
      h(1L, 0x1234567890abcdefL, 0x0f0f0f0f0f0f0f0fL),
      h(2L, 0x1234567890abcdeeL, 0x0f0f0f0f0f0f0f0fL), // 1 bit off #1
      h(3L, -0x123456789L, 0x7777777777777777L))
    val stored = storedRows.toDF("media_id", "lo", "hi")
    val extra = Seq(h(50L, 0x5555555555555555L, 0x3333333333333333L))
      .toDF("media_id", "lo", "hi")
    val incoming = Seq(
      h(100L, 0x1234567890abcdefL, 0x0f0f0f0f0f0f0f1fL), // 1 bit off #1
      h(101L, 0x5555555555555555L, 0x3333333333333337L), // 2 bits off #50
      h(102L, -0x4242424242424242L, 0x4242424242424242L)) // matches none
      .toDF("media_id", "lo", "hi")
    def verdicts(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("ma"), r.getAs[Long]("mb"),
        r.getAs[Long]("hamming"))).toSet

    val live = Graft.phashIndex(stored)
    val base = verdicts(live.screen(incoming))
    assert(base.map(v => (v._1, v._2)) == Set((100L, 1L), (100L, 2L)),
      s"unexpected screen verdicts: $base")

    val d = tmp()
    live.save(d)
    assert(verdicts(Graft.loadPhashIndex(spark, d).screen(incoming))
      == base)

    // append ≡ build-all (doc 101 now matches the appended 50)
    val all = verdicts(Graft.phashIndex(stored.unionByName(extra))
      .screen(incoming))
    assert(verdicts(live.append(extra).screen(incoming)) == all)
    Graft.loadPhashIndex(spark, d).appendDurable(d, extra)
    assert(verdicts(Graft.loadPhashIndex(spark, d).screen(incoming))
      == all)
    assert(all.exists(v => v._1 == 101L && v._2 == 50L))

    // insert-then-delete returns to never-inserted; compact applies
    Graft.deleteFromIndex(spark, d, Seq(50L).toDF("vec_id"))
    assert(verdicts(Graft.loadPhashIndex(spark, d).screen(incoming))
      == base)
    Graft.compactIndex(spark, d)
    assert(!new java.io.File(s"$d/tombstones").exists())
    assert(verdicts(Graft.loadPhashIndex(spark, d).screen(incoming))
      == base)

    // shard + merge
    val root = tmp()
    Graft.phashIndex(stored).save(s"$root/main")
    Graft.phashIndex(stored).shard(s"$root/s1", extra)
    Graft.mergeIndex(spark, s"$root/main", s"$root/s1")
    assert(verdicts(Graft.loadPhashIndex(spark, s"$root/main")
      .screen(incoming)) == all)

    // bucketCap: cap 1 keeps singleton buckets — the 1-bit-apart
    // stored pair #1/#2 shares 4 of 5 band buckets, so both drop from
    // those; their DIFFERING band still screens them (cap binds per
    // bucket, not per media)
    val capped = verdicts(live.screen(incoming, bucketCap = Some(1L)))
    assert(capped.subsetOf(base))
  }

  test("bucketCap drops hot-bucket boilerplate; screenStream equals batch screen") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60 identical stored docs (one hot bucket per band) + one
    // ordinary stored doc; the arriving batch contains a copy of both
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val normal = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val storedDocs = ((0L until 60L).map(i => (i, boiler)) :+ (100L, normal))
      .toDF("doc_id", "text")
    val arriving = Seq((1000L, boiler), (1001L, normal))
      .toDF("doc_id", "text")
    val idx = Graft.lshIndex(storedDocs)

    val uncapped = verdicts(idx.screen(arriving))
    assert(uncapped.count(_._1 == 1000L) == 60) // every clique member
    assert(uncapped.exists(v => v._1 == 1001L && v._2 == 100L))

    val capped = verdicts(idx.screen(arriving, bucketCap = Some(50)))
    assert(capped == uncapped.filter(_._1 == 1001L),
      s"cap failed to drop the boilerplate clique: $capped")

    // the at-ingest stream runs the same kernel per micro-batch
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.DocStreams.Doc]
    val hits = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = idx.screenStream(stream.toDS()) { batch =>
      hits.synchronized { hits ++= verdicts(batch) }
    }
    val ts = java.sql.Timestamp.valueOf("2026-01-01 09:00:00")
    stream.addData(graft.streaming.DocStreams.Doc(1000L, ts, boiler),
      graft.streaming.DocStreams.Doc(1001L, ts, normal))
    q.processAllAvailable()
    q.stop()
    assert(hits.toSet == uncapped)
  }

  test("lshScreenStreamCurrent: a mid-stream publish flips the screening generation on the next batch, no restart, no mixed batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmp() + "/lsh-root"
    // two generations over the SAME texts under DISJOINT id ranges —
    // a verdict's stored_id range proves which generation screened it
    val b1 = tmp(); Graft.lshIndex(stored).save(b1)
    assert(Graft.publishIndex(spark, root, b1) == 1)
    val ts = java.sql.Timestamp.valueOf("2026-01-01 09:00:00")
    val batch = incoming.select(col("doc_id"), col("text")).collect()
      .map(r => graft.streaming.DocStreams.Doc(r.getLong(0), ts,
        r.getString(1)))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.DocStreams.Doc]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Set[(Long, Long, Double)])]
    val q = Graft.lshScreenStreamCurrent(root, stream.toDS()) {
      (gen, v) => got += ((gen, verdicts(v)))
    }
    try {
      stream.addData(batch.toSeq)
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(1))
      assert(got(0)._2.nonEmpty &&
        got(0)._2.forall(_._2 < 1000000L),
        "generation 1 must screen against the original ids only")
      // retrain (same corpus, shifted ids) + publish WHILE the stream
      // runs — the very next batch screens against generation 2
      val b2 = tmp()
      Graft.lshIndex(stored.withColumn("doc_id",
        col("doc_id") + 1000000L)).save(b2)
      assert(Graft.publishIndex(spark, root, b2) == 2)
      stream.addData(batch.toSeq)
      q.processAllAvailable()
      assert(got.map(_._1).toSeq == Seq(1, 2))
      assert(got(1)._2.nonEmpty &&
        got(1)._2.forall(_._2 >= 1000000L),
        "generation 2 must screen against the shifted ids only — " +
          "no mixed batch")
      // same texts ⇒ the verdict sets match modulo the id shift
      assert(got(1)._2.map(v => (v._1, v._2 - 1000000L, v._3))
        == got(0)._2)
    } finally q.stop()
  }

  test("repairIndex rebuilds LSH band coverage after a crashed append: stranded docs become candidates again, verdicts exact") {
    val d = tmp()
    Graft.lshIndex(stored).save(d)
    val expect = verdicts(Graft.loadLshIndex(spark, d).screen(incoming))
    assert(expect.nonEmpty)
    // crash signature: sigs landed, bands didn't — drop one whole
    // band's dirs (every stored doc now has 15 of 16 band rows; a
    // candidate whose only matching band was the dropped one would
    // silently stop screening)
    val bandDirs = new java.io.File(s"$d/bands").listFiles()
      .filter(f => f.isDirectory && f.getName == "band=3")
    assert(bandDirs.length == 1)
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete()
    }
    rmRf(bandDirs(0))
    // detection surfaces in deep describe too (the bm25 orphan row's
    // sibling), before any heal
    assert(Graft.describeIndex(spark, d, deep = true)
      .filter(col("table") === "_band_coverage_inconsistent_ids")
      .select(col("n_rows")).head().getLong(0) > 0L)
    val rep = Graft.repairIndex(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rep.contains("band_coverage_inconsistent_ids") &&
      rep("band_coverage_inconsistent_ids") > 0L, s"report: $rep")
    assert(verdicts(Graft.loadLshIndex(spark, d).screen(incoming))
      == expect, "rebuilt bands must restore the exact verdicts")
    // healthy after the heal: a second repair reports nothing
    assert(Graft.repairIndex(spark, d).count() == 0L)
  }

  test("repairIndex rebuilds pHash band coverage after a crashed append") {
    val spark2 = spark
    import spark2.implicits._
    spark.conf.set("spark.graft.probeBuckets", "16")
    try {
      val media = spark.range(0, 120).toDF("media_id")
        .withColumn("lo", expr(
          "xxhash64(media_id div 2) & 4294967295 ^ (media_id % 2)"))
        .withColumn("hi", expr(
          "xxhash64(media_id div 2 + 999) & 4294967295"))
        .select(col("media_id"), col("lo"), col("hi"))
      val storedM = media.filter(col("media_id") % 2 === 1)
      val batch = media.filter(col("media_id") % 2 === 0 &&
        col("media_id") < 8)
      val d = tmp()
      Graft.phashIndex(storedM).save(d)
      val loadedBefore = Graft.loadPhashIndex(spark, d)
      val expect = loadedBefore.screen(batch).collect()
        .map(_.toSeq).toSet
      assert(expect.nonEmpty)
      // strand: remove several pb dirs — the stored near-dups lose
      // band rows and (for the dropped chunks) stop being candidates
      val dropped = new java.io.File(s"$d/bands").listFiles()
        .filter(_.isDirectory).take(12)
      def rmRf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmRf)
        f.delete()
      }
      dropped.foreach(rmRf)
      val rep = Graft.repairIndex(spark, d)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rep.contains("band_coverage_inconsistent_ids") &&
        rep("band_coverage_inconsistent_ids") > 0L, s"report: $rep")
      assert(Graft.loadPhashIndex(spark, d).screen(batch).collect()
        .map(_.toSeq).toSet == expect,
        "rebuilt pb bands must restore the exact screen verdicts")
      assert(Graft.repairIndex(spark, d).count() == 0L)
    } finally spark.conf.unset("spark.graft.probeBuckets")
  }
}
