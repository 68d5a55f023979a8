package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.SparkEntry

/** Semantic invariants for approximate/derived-output queries.
  * Historically named RowsOnlyQueriesSpec — every query here has since
  * been upgraded to a full DuckDB gate (round 10 closed the last one:
  * the board is oracles-everywhere); the invariant assertions stay as
  * EXTRA coverage of the defining properties (Hamming bounds, ranking
  * shape, recall, determinism, horizon-bounded lineage), which a
  * hash-match alone does not articulate.
  */
class QueryInvariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("d05_simhash: ordered pairs within the Hamming bound") {
    // now also DuckDB-gated (md5-derived 60-bit hash); keep the invariant
    val rows = q("d05_simhash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("da") < r.getAs[Long]("db"))
      assert(r.getAs[Long]("hamming") <= 8)
    }
  }

  test("ANN variants return well-formed rankings with cos in [-1, 1]") {
    Seq("e03_ann_lsh", "e05_ann_ivf", "e06_ann_ivf_kmeans",
        "e16_ann_pq_rerank").foreach { name =>
      val rows = q(name).collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
      byQuery.foreach { case (_, rs) =>
        val ranks = rs.map(_.getAs[Long]("rank")).sorted
        assert(ranks.toSeq == (1L to ranks.length), s"$name ranks must be 1..k")
        // scores non-increasing with rank
        val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
          s"$name scores must be non-increasing")
        rs.foreach(r => assert(math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
      }
    }
  }

  test("e16 re-rank recovers recall the raw ADC ranking loses") {
    // e12 scores the PQ index by its compressed-domain approximation;
    // e17 scores the SAME index (shared pqSearch) after the exact
    // re-rank of the top-10 shortlist. The whole point of the two-stage
    // pattern is that stage 2 repairs stage 1's quantization error, so
    // across the query set the re-ranked matches must dominate the raw
    // ADC matches (at sf0.001: 3 vs 0).
    def total(name: String): Long =
      q(name).agg(sum(col("n_matched"))).head().getLong(0)
    val adc = total("e12_ann_recall_pq")
    val rr = total("e17_ann_recall_rerank")
    assert(rr >= adc, s"re-rank recall ($rr) must not trail ADC ($adc)")
    assert(rr >= 1, "re-rank must recover at least one exact neighbor")
  }

  test("IVF top-1 agrees with exact kNN top-1 when the cell contains it") {
    // weaker-but-checkable recall property: every IVF result must appear
    // somewhere in the exact top-50 of its query
    val exact = SparkEntry.queries("e01_knn_bruteforce")(spark, d)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = q("e06_ann_ivf_kmeans").filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
    assert(ivf.nonEmpty)
    // at sf0.001 the corpus is small; IVF's rank-1 is usually the true
    // rank-1 — require at least half the queries agree exactly
    val agree = ivf.count(r => exact.contains((r.getLong(0), r.getLong(1))))
    assert(agree * 2 >= ivf.length, s"IVF top-1 agreement too low: $agree/${ivf.length}")
  }

  test("mm02_decode_features: real PNG decode round-trip, all rows covered") {
    val a = q("mm02_decode_features").collect()
    val b = q("mm02_decode_features").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // deterministic
    assert(a.length == spark.read.parquet(s"$d/documents.parquet").count())
    a.foreach { r =>
      val id = r.getAs[Long]("media_id")
      // decoded dims equal the generated dims: the ImageIO round trip
      // (encode → opaque bytes → decode) preserved the image
      assert(r.getAs[Int]("width") == 8 + (id % 24).toInt)
      assert(r.getAs[Int]("height") == 8 + ((id * 7) % 24).toInt)
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val m = r.getAs[Double](c)
        assert(m >= 0.0 && m <= 255.0, s"$c out of pixel range: $m")
      }
    }
  }

  test("mm04_audio_features: real WAV codec round-trip preserves the waveform") {
    val rows = q("mm04_audio_features").collect()
    assert(rows.length == spark.read.parquet(s"$d/documents.parquet").count())
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      // sample count and rate come from the DECODER (AudioSystem), so they
      // prove the WAV container round-tripped, not just the raw bytes
      assert(r.getAs[Long]("n_samples") == 400 + (id % 100) * 4)
      assert(r.getAs[Int]("sample_rate") == 8000)
      val peak = r.getAs[Long]("peak")
      assert(peak >= 0 && peak <= 1000, s"peak outside waveform range: $peak")
      assert(math.abs(r.getAs[Double]("mean_amp")) <= 1000.0)
    }
  }

  test("t09_repetition_signals: fractions lie in [0,1], every doc covered") {
    val rows = q("t09_repetition_signals").collect()
    assert(rows.length == spark.read.parquet(s"$d/documents.parquet").count())
    rows.foreach { r =>
      Seq("top_unigram_frac", "top_bigram_frac", "dup_trigram_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
    }
  }

  test("t10_pii_scrub: injected PII is found and redaction changes the text") {
    val rows = q("t10_pii_scrub").collect()
    assert(rows.length == spark.read.parquet(s"$d/documents.parquet").count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 7 == 0)
        assert(r.getAs[Long]("n_emails") == 1 && r.getAs[Boolean]("has_pii"))
      else if (id % 11 == 3) {
        assert(r.getAs[Long]("n_phones") == 1 && r.getAs[Long]("n_ips") == 1)
        assert(r.getAs[Boolean]("has_pii"))
      } else {
        assert(r.getAs[Long]("n_emails") == 0 && r.getAs[Long]("n_phones") == 0
          && r.getAs[Long]("n_ips") == 0 && !r.getAs[Boolean]("has_pii"))
      }
    }
  }

  test("e07_semantic_dedup: min-id per cell always survives; verdict total") {
    val rows = q("e07_semantic_dedup").collect()
    assert(rows.length ==
      spark.read.parquet(s"$d/embeddings.parquet").count())
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
    byCell.foreach { case (cell, rs) =>
      val minId = rs.map(_.getAs[Long]("vec_id")).min
      val minRow = rs.find(_.getAs[Long]("vec_id") == minId).get
      assert(minRow.getAs[Boolean]("keep"),
        s"cell $cell: lowest-id vector must be kept (nothing precedes it)")
    }
    assert(rows.exists(!_.getAs[Boolean]("keep")),
      "threshold 0.4 should drop at least one near-duplicate at sf0.001")
  }

  test("prov_events_pipeline: element counts conserve and fan-in covers the sample") {
    val rows = q("prov_events_pipeline").collect()
    assert(rows.nonEmpty)
    val elements = rows.filter(_.getAs[String]("kind") == "elements")
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("n")).toMap
    // map is 1→1: source and pair element counts must agree; the agg
    // has at least one bucket and no more buckets than pairs
    assert(elements("events sample") == elements("key by hour+type"))
    val nAgg = elements("hourly agg")
    assert(nAgg >= 1 && nAgg <= elements("events sample"))
    // the fan-in histogram partitions the sample exactly: sum over
    // buckets of (bucket_size × n_buckets) = sample size, and the
    // number of buckets in the histogram = agg element count
    val fanin = rows.filter(_.getAs[String]("kind") == "fanin")
      .map(r => r.getAs[String]("key").toInt -> r.getAs[Long]("n"))
    assert(fanin.map { case (sz, n) => sz * n }.sum ==
      elements("events sample"))
    assert(fanin.map(_._2).sum == nAgg)
  }

  test("prov showcases return consistent graph shapes") {
    val fg = q("prov_full_graph").collect()
    val kinds = fg.groupBy(_.getAs[String]("kind")).view.mapValues(_.length).toMap
    assert(kinds.getOrElse("element", 0) > 0 && kinds.getOrElse("edge", 0) > 0)
    val vt = q("prov_value_table").collect()
    assert(vt.nonEmpty && vt.forall(_.getAs[String]("header") == "Key,Value"))
  }

  test("prov_events_stream: record leaves are dep-free, agg updates carry the horizon deps") {
    val rows = q("prov_events_stream").collect()
      .map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n_elements"), r.getAs[Long]("n_lineage_edges"))).toMap
    // every one of the 200 replayed events minted exactly one dep-free
    // record element
    assert(rows("record") == (200L, 0L), s"records: ${rows.get("record")}")
    // each per-user aggregate update depends on >= 1 in-horizon record,
    // and there are at most (users x 2 batches) updates
    val (nAgg, nEdges) = rows("agg_update")
    assert(nAgg >= 1 && nAgg <= 400, s"agg updates: $nAgg")
    assert(nEdges >= nAgg,
      s"each update needs at least one lineage edge: $nEdges < $nAgg")
  }
}
