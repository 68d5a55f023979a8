package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale patterns asserted on plan shape, not just results: bucketing
  * eliminates the join shuffle; salting spreads a skewed key. These are
  * the 100 TB levers (SURVEY §4.2 / build guidance) proven at test scale.
  */
class ScalePatternsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val warehouse = Files.createTempDirectory("warehouse").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    // AQE wraps plans in AdaptiveSparkPlanExec, hiding exchanges from
    // plan-shape assertions; the AQE test re-enables it explicitly
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case _: ShuffleExchangeExec => 1
    }.sum

  /** Shuffles excluding the round-robin exchange QueryDef.scaleOut
    * inserts when a LEAF SCAN is narrower than the machine (round 16):
    * that exchange is partition-count-conditional — absent by
    * construction at production scale, where the scan has more splits
    * than cores — so the SEMANTIC shuffle count is what a scale claim
    * pins. Keyed exchanges (hash/range) still count.
    */
  private def countSemanticShuffles(
      df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec
          if !s.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => 1
    }.sum

  test("connected components shortcut converges in O(log n) rounds on a chain") {
    val spark2 = spark
    import spark2.implicits._
    // a 257-node path: worst case for neighbor-min propagation, which
    // would need ~256 rounds; hook+shortcut must stay logarithmic
    val chain = (0 until 256).map(i => (i.toLong, (i + 1).toLong))
      .toDF("da", "db")
    val r = ConnectedComponents.run(chain, maxRounds = 20)
    assert(r.rounds <= 12, s"took ${r.rounds} rounds — shortcutting broken?")
    val labels = r.labels.collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(labels.length == 257 && labels.forall(_._2 == 0L))
    // two separate components keep distinct canonical labels
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("da", "db")
    val l2 = ConnectedComponents.run(two).labels.collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(l2(1L) == 1L && l2(2L) == 1L && l2(3L) == 1L)
    assert(l2(10L) == 10L && l2(11L) == 10L)
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    val unbucketed = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).count()
    val bucketed = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).count()

    assert(countShuffles(unbucketed) >= 2,  // both sides shuffle on the key
      "unbucketed join should shuffle both sides")
    assert(countShuffles(bucketed) <= 1,    // only the final groupBy moves data
      "bucketed join must not shuffle the join inputs")
    // identical results
    assert(bucketed.collect().map(_.toSeq).toSet ==
      unbucketed.collect().map(_.toSeq).toSet)
  }

  test("salted join spreads a skewed key and preserves results") {
    val spark2 = spark
    import spark2.implicits._
    val salt = 8
    // skew: one key holds 90% of the fact side
    val fact = (1 to 10000).map(i => (if (i <= 9000) 1L else i.toLong, i.toDouble))
      .toDF("k", "v")
    val dim = (1 to 10000).map(i => (i.toLong, s"name$i")).toDF("k", "name")

    val plain = fact.join(dim, "k").groupBy("k").agg(sum("v").as("s"))

    val saltedFact = fact.withColumn("salt",
      (rand(42) * salt).cast("int"))
    val explodedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salt - 1))))
    val salted = saltedFact.join(explodedDim, Seq("k", "salt"))
      .groupBy("k").agg(sum("v").as("s"))

    assert(salted.collect().map(_.toSeq).toSet ==
      plain.collect().map(_.toSeq).toSet)
    // the salted join key has `salt`× the distinct values on the hot key
    val spread = saltedFact.filter($"k" === 1L)
      .select(countDistinct($"salt")).head().getLong(0)
    assert(spread > 1, "hot key must spread across salt partitions")
  }

  test("headline query plans keep their scale properties") {
    val d = "/root/testdata/sf0.001"
    // q01: filter pushed to the parquet scan, columns pruned
    val q01 = graft.SparkEntry.queries("q01_pricing_summary")(spark, d)
    val p01 = q01.queryExecution.executedPlan.toString
    assert(p01.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"q01 must push the shipdate filter:\n$p01")
    assert(!p01.contains("l_orderkey"), "q01 must prune unused columns")
    // q05: the three HINTED dimension joins broadcast even with
    // autoBroadcastJoinThreshold=-1 (this suite disables auto-broadcast);
    // the fact⋈fact join is left to the planner, as it should be at scale
    val q05 = graft.SparkEntry.queries("q05_nation_revenue")(spark, d)
    val p05 = q05.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p05).size >= 3,
      s"q05 must broadcast the three hinted dims:\n$p05")
  }

  test("round-4 ops have the plans their scale claims require") {
    val d = "/root/testdata/sf0.001"
    // d11 intra-doc dedup: the operator itself is one projection — the
    // ONLY shuffle in the whole query is the gate's final global sort
    val d11 = DedupQueries.d11IntraDocDedup.fn(spark, d)
    assert(countShuffles(d11) == 1,
      s"d11 must shuffle only for the output sort:\n${d11.queryExecution.executedPlan}")
    // t15: since the round-4 rewrite the top-unigram rule evaluates
    // per-row too, so the whole filter is one projection + the sort
    // (plus, at bench scale only, scaleOut's narrow-scan widening —
    // excluded by countSemanticShuffles, absent at production scale)
    val t15 = TextAnalysisQueries.t15C4Filter.fn(spark, d)
    assert(countSemanticShuffles(t15) == 1,
      s"t15 must shuffle only for the output sort:\n${t15.queryExecution.executedPlan}")
    // t19: the CMS aggregate must partial-aggregate (map-side combine) —
    // the property that makes it one tiny buffer per partition at 100 TB
    val t19 = TextAnalysisQueries.t19HeavyHittersCms.fn(spark, d)
    val p19 = t19.queryExecution.executedPlan.toString
    assert(p19.contains("partial_count_min_agg"),
      s"t19 CMS must map-side combine:\n$p19")
    // q64: the part filter is a hinted broadcast — the big lineitem scan
    // must never shuffle to meet it
    val q64 = SqlSurfaceQueries.q64DominantSuppliers.fn(spark, d)
    val p64 = q64.queryExecution.executedPlan.toString
    assert(p64.contains("BroadcastHashJoin"),
      s"q64 must broadcast the small-parts side:\n$p64")
  }

  test("round-7-final ops have the plans their scale claims require") {
    val d = "/root/testdata/sf0.001"
    // mm07: candidate generation is the BANDED equi-join on the 13/12-bit
    // chunk — hashes shuffle, pixels never do, and nothing may fall
    // back to all-pairs probing
    val mm07 = MultimodalQueries.mm07PerceptualHashDedup.fn(spark, d)
    val p07 = mm07.queryExecution.executedPlan.toString
    assert(!p07.contains("CartesianProduct") &&
      !p07.contains("BroadcastNestedLoopJoin"),
      s"mm07 must stay a banded equi-join:\n$p07")
    // e20: the per-vector packing aggregate must map-side combine —
    // what keeps the shuffle at 16 bytes/vector instead of 64 dims
    val e20 = SimilarityQueries.e20BinaryQuant.fn(spark, d)
    val p20 = e20.queryExecution.executedPlan.toString
    assert(p20.contains("partial_sum"),
      s"e20's packing agg must partial-aggregate:\n$p20")
    // t22: model-table joins are hash joins on token keys; the only
    // nested-loop is the broadcast single-row vocab scalar
    val t22 = TextAnalysisQueries.t22BigramPerplexity.fn(spark, d)
    val p22 = t22.queryExecution.executedPlan.toString
    assert(!p22.contains("CartesianProduct"),
      s"t22 must never plan a cartesian:\n$p22")
    // e22: the lexical side is ONE token-keyed equi-join (query terms
    // vs postings) — never a cartesian; the dense side's only
    // nested-loop is the 5-row broadcast query side (e01's shape).
    // The broadcasts are EXPLICIT hints (this suite runs with
    // auto-broadcast off, so their survival here proves the 100 TB
    // claim — "postings stream, query side broadcasts" — is enforced
    // by the plan, not by statistics): the idf-fold join (qterms into
    // the vocab-sized df table) and the postings join (idf-annotated
    // qterms into tf) must BOTH be BroadcastHashJoins.
    val e22 = SimilarityQueries.e22HybridRrf.fn(spark, d)
    val p22e = e22.queryExecution.executedPlan.toString
    assert(!p22e.contains("CartesianProduct"),
      s"e22 must never plan a cartesian:\n$p22e")
    val nBhj22 = "BroadcastHashJoin".r.findAllIn(p22e).length
    assert(nBhj22 >= 2,
      s"e22's query-term side must broadcast into both the df and the " +
        s"postings joins (found $nBhj22 BroadcastHashJoins):\n$p22e")
  }

  test("t23's approx-boundary binning tracks the exact deciles with no global sort") {
    val d = "/root/testdata/sf0.001"
    val exact = TextAnalysisQueries.t23QualityBins.fn(spark, d).collect()
    val approx = TextAnalysisQueries.qualityBinsApprox(spark, d)
    // the 100 TB claim: boundaries ride as literals, binning is a pure
    // projection — no window (the exact form's single-partition ntile
    // sort is precisely what this variant removes)
    val pa = approx.queryExecution.executedPlan.toString
    assert(!pa.contains("Window"),
      s"approx binning must not plan a window/global sort:\n$pa")
    val rows = approx.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      exact.map(_.getAs[Long]("n_docs")).sum)
    // per-bin drift vs exact is bounded by boundary ties + sketch error
    val exactBy = exact.map(r =>
      r.getAs[Long]("decile") -> r.getAs[Long]("n_docs")).toMap
    rows.foreach { r =>
      val drift = math.abs(r.getAs[Long]("n_docs") -
        exactBy(r.getAs[Long]("decile")))
      assert(drift <= 10, s"bin ${r.getLong(0)} drifted by $drift docs")
    }
    // bins are value-ordered: a lower decile never dips below the next
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("q_min") >= b.getAs[Double]("q_max"),
          s"bins overlap: ${a.mkString(",")} vs ${b.mkString(",")}")
      case _ =>
    }
  }

  test("q69's literal EXISTS/NOT EXISTS decorrelate to semi/anti hash joins") {
    val d = "/root/testdata/sf0.001"
    // the whole point of q69 is that Catalyst plans the correlated
    // subqueries itself: EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both
    // as HASH joins on l_orderkey — never a per-row nested-loop probe
    val q69 = SqlSurfaceQueries.q69SoleReturnedSupplier.fn(spark, d)
    val p = q69.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must become an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q69 must not fall back to per-row probing:\n$p")
  }

  test("q70's correlated scalar subquery decorrelates to one grouped aggregate") {
    val d = "/root/testdata/sf0.001"
    // Q17 shape: Catalyst must rewrite the per-row 0.2*avg(...) scalar
    // subquery into a single per-part aggregate joined back on
    // l_partkey — the plan has hash aggregates + hash joins and no
    // per-row probe
    val q70 = SqlSurfaceQueries.q70SmallQtyRevenue.fn(spark, d)
    val p = q70.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"),
      s"the correlated avg must become a grouped aggregate:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q70 must not fall back to per-row probing:\n$p")
  }

  test("q74's correlated min-with-joins decorrelates; q76's NOT IN plans an anti join") {
    val d = "/root/testdata/sf0.001"
    // Q2 literal form: the scalar MIN subquery repeats a three-dimension
    // join chain inside itself; Catalyst must hoist it into a per-part
    // aggregate joined back — hash joins throughout, no per-row probe
    val q74 = SqlSurfaceQueries.q74MinCostSupplier.fn(spark, d)
    val p74 = q74.queryExecution.executedPlan.toString
    assert(p74.contains("HashAggregate"),
      s"the correlated min must become a grouped aggregate:\n$p74")
    assert(!p74.contains("BroadcastNestedLoopJoin") && !p74.contains("CartesianProduct"),
      s"q74 must not fall back to per-row probing:\n$p74")
    // Q16: NOT IN over a non-nullable key column plans as a LeftAnti
    // hash join (degenerating to null-aware only if the key were
    // nullable) — never a nested-loop scan of the exclusion list
    val q76 = SqlSurfaceQueries.q76SupplierCount.fn(spark, d)
    val p76 = q76.queryExecution.executedPlan.toString
    assert(p76.contains("LeftAnti"),
      s"NOT IN must become an anti join:\n$p76")
    assert(!p76.contains("CartesianProduct"),
      s"q76 must not cartesian the exclusion list:\n$p76")
  }

  test("q77/q78/q80 keep their TPC-H scale properties") {
    val d = "/root/testdata/sf0.001"
    // Q5 shape: both dimension joins are hinted broadcasts, and the
    // same-nation constraint rides the supplier join as a SECOND
    // equi-key (c_nationkey = s_nationkey), not a post-join filter
    val q77 = SqlSurfaceQueries.q77LocalSupplierVolume.fn(spark, d)
    val p77 = q77.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p77).size >= 2,
      s"q77 must broadcast nation and region:\n$p77")
    assert(!p77.contains("CartesianProduct") &&
      !p77.contains("BroadcastNestedLoopJoin"),
      s"q77's same-nation predicate must stay an equi-join key:\n$p77")
    // Q6 shape: every predicate reaches the parquet scan, and the scan
    // reads only the four columns the query touches
    val q78 = SqlSurfaceQueries.q78ForecastRevenue.fn(spark, d)
    val p78 = q78.queryExecution.executedPlan.toString
    assert(p78.contains("PushedFilters:") && p78.contains("IsNotNull(l_shipdate)"),
      s"q78's filters must be pushed to the scan:\n$p78")
    assert(!p78.contains("l_orderkey") && !p78.contains("l_returnflag"),
      s"q78 must prune columns it never touches:\n$p78")
    assert(!p78.contains("Exchange") || countShuffles(q78) == 1,
      s"q78 is scan+aggregate — at most the final single-row exchange:\n$p78")
    // Q10 shape: ORDER BY ... LIMIT 20 must plan TakeOrderedAndProject
    // (per-partition local top-k), never a global sort of all customers
    val q80 = SqlSurfaceQueries.q80ReturnedItems.fn(spark, d)
    val p80 = q80.queryExecution.executedPlan.toString
    assert(p80.contains("TakeOrderedAndProject"),
      s"q80's top-20 must be TakeOrderedAndProject:\n$p80")
  }

  test("events-family headline plans keep their scale properties") {
    val d = "/root/testdata/sf0.001"
    // q56 as-of join: the union-tag + carry-forward window formulation
    // has NO join operator at all — both sides union, shuffle ONCE on
    // user_id for the window, plus only the gate's output sort; a
    // range-explode or per-row probe would show up as a join node
    val q56 = EventsQueries.q56AsofAttribution.fn(spark, d)
    val p56 = q56.queryExecution.executedPlan.toString
    assert(!p56.contains("Join"),
      s"q56's as-of must be windowed, never a join probe:\n$p56")
    assert(countShuffles(q56) <= 2,
      s"q56 must shuffle once for the window + once for the sort:\n$p56")
    // q66 funnel: three chained whole-partition windows over ONE
    // user_id exchange — no join operator anywhere, and the rollup
    // reuses the window partitioning, so only the output sort adds a
    // second shuffle (the round-7 rewrite; the old join-chain form
    // paid ~6 shuffle/sort legs and degraded at 100× events)
    val q66 = EventsQueries.q66EventFunnel.fn(spark, d)
    val p66 = q66.queryExecution.executedPlan.toString
    assert(!p66.contains("Join"),
      s"q66 must be windowed, never stage-joined:\n$p66")
    assert(countShuffles(q66) <= 3,
      s"q66 must shuffle once for the window (+ output sort):\n$p66")
  }

  test("d15's benchmark side broadcasts: the corpus never shuffles for candidates") {
    val d = "/root/testdata/sf0.001"
    // decontamination's scale claim: both the band-bucket join and the
    // exact-verify join meet the benchmark side as an explicit
    // broadcast (provable here because this suite disables
    // auto-broadcast) — the 100 TB corpus side streams map-side
    val d15 = DedupQueries.d15CrossDecontamination.fn(spark, d)
    val p = d15.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"d15 must broadcast the benchmark buckets AND shingles:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"d15 must never cross-join the corpora:\n$p")
  }

  test("ANN rank filters get Spark's WindowGroupLimit (no unbounded group sort)") {
    val d = "/root/testdata/sf0.001"
    // e01/e05's `row_number <= k` filters must trigger
    // InferWindowGroupLimit: a per-partition streaming top-k pass
    // BEFORE the window sort, so no executor ever sorts an unbounded
    // per-query candidate group — the property that keeps the
    // brute-force and IVF rankers linear at corpus scale
    for (n <- Seq("e01_knn_bruteforce", "e05_ann_ivf")) {
      val p = graft.SparkEntry.queries(n)(spark, d)
        .queryExecution.executedPlan.toString
      assert(p.contains("WindowGroupLimit"),
        s"$n must carry the group-limit pass:\n$p")
    }
  }

  test("t24's bottom-k runs on the bounded-heap operator, not a window sort") {
    val d = "/root/testdata/sf0.001"
    // the sketch's scale claim: retaining the 64 smallest hashes per
    // source is a fixed-size heap on both the map side and the final
    // side (TopKPerKeyExec partial+final), never a full per-source
    // sort of every distinct hash just to discard all but 64
    val t24 = TextAnalysisQueries.t24DistinctKmv.fn(spark, d)
    val p = t24.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"),
      s"t24 must route its bottom-k through TopKPerKeyExec:\n$p")
    assert(!p.contains("Window"),
      s"t24 must not fall back to a row_number window sort:\n$p")
  }

  test("d17's benchmark side broadcasts: the corpus streams one linear pass") {
    val d = "/root/testdata/sf0.001"
    // semantic decontamination is non-equi by construction (no key to
    // hash on), so the RIGHT shape is a BroadcastNestedLoopJoin whose
    // build side is the tiny benchmark — never a CartesianProduct
    // (which would shuffle/partition BOTH sides)
    val d17 = DedupQueries.d17SemanticDecontamination.fn(spark, d)
    val p = d17.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"d17 must broadcast the benchmark side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"d17 must never partition both sides:\n$p")
  }

  test("e16's exact re-rank never rescans or shuffle-joins the corpus") {
    val d = "/root/testdata/sf0.001"
    // stage 2's scale claim: raw vectors for the ~50-row shortlist are
    // fetched via broadcast equality joins against the corpus scan —
    // with auto-broadcast disabled here, any regression to a
    // shuffle-side join would surface as a SortMergeJoin
    val e16 = SimilarityQueries.e16AnnPqRerank.fn(spark, d)
    val p = e16.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"e16 must broadcast the shortlist AND the query vectors:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"e16 must never shuffle the corpus for the re-rank join:\n$p")
  }

  test("d19 screen broadcasts the arriving batch; the stored index never shuffle-joins") {
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val idx = graft.api.Graft.lshIndex(docs.filter(col("doc_id") % 3 =!= 0))
    val screen = idx.screen(docs.filter(col("doc_id") % 3 === 0))
    val p = screen.queryExecution.executedPlan.toString
    // with auto-broadcast disabled, all three joins must still be
    // explicit broadcasts: the bucket probe (incoming band keys into
    // the stored band table) and both verify fetches (candidates into
    // the signature tables) — the stored side never shuffles
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"d19 screen must broadcast the batch side of all three joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"d19 screen must never shuffle the stored index:\n$p")
  }

  test("tombstone masks and the loaded BM25 search are broadcast joins, never corpus shuffles") {
    val d = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val spark2 = spark
    import spark2.implicits._

    // IVF with tombstones: the delete mask must ride the scan as a
    // broadcast LeftAnti hash join even with auto-broadcast off
    val dIvf = java.nio.file.Files
      .createTempDirectory("graft_plan_tomb").toString
    graft.api.Graft.annIndex(emb).save(dIvf)
    graft.api.Graft.deleteFromIndex(spark, dIvf,
      Seq(3L, 14L).toDF("vec_id"))
    val p1 = graft.api.Graft.loadAnnIndex(spark, dIvf)
      .search(emb.filter(col("vec_id") < 5))
      .queryExecution.executedPlan.toString
    assert(p1.contains("BroadcastHashJoin") && p1.contains("LeftAnti"),
      s"tombstone mask must be a broadcast anti-join:\n$p1")
    assert(!p1.contains("SortMergeJoin"),
      s"tombstone mask must never shuffle the corpus:\n$p1")

    // loaded BM25 searchText: idf-annotated query terms broadcast into
    // the postings scan (the e22 kernel shape, through the store)
    val dBm = java.nio.file.Files
      .createTempDirectory("graft_plan_bm25").toString
    graft.api.Graft.bm25Index(docs).save(dBm)
    val p2 = graft.api.Graft.loadBm25Index(spark, dBm)
      .searchText(docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("text")))
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p2).size >= 2,
      s"loaded BM25 search must broadcast the query-term side:\n$p2")
    // the ONE allowed shuffle join is candidates <-> doclen (both
    // sides candidate/corpus-proportional — e22's documented shape:
    // "only the candidate subset meets dl"); the postings join itself
    // must stay broadcast-side
    assert("SortMergeJoin".r.findAllIn(p2).size <= 1,
      s"loaded BM25 search grew an extra shuffle join:\n$p2")
  }

  test("d13 bloom sketches merge: bit_or of split sketches = union sketch") {
    // the incremental-ingest property d13's scaladoc claims: sketching
    // two halves of a corpus separately and bit_or-merging the word
    // tables must equal sketching the union in one pass — so a 100 TB
    // corpus sketch can be grown batch by batch, never rebuilt
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val a = DedupQueries.BloomSketch.segmentHashesOf(
      docs.filter(col("doc_id") % 2 === 0)).select("h").distinct()
    val b = DedupQueries.BloomSketch.segmentHashesOf(
      docs.filter(col("doc_id") % 2 === 1)).select("h").distinct()
    val merged = DedupQueries.BloomSketch.sketchOf(a)
      .unionByName(DedupQueries.BloomSketch.sketchOf(b))
      .groupBy("w").agg(expr("bit_or(word)").as("word"))
    val whole = DedupQueries.BloomSketch.sketchOf(a.unionByName(b).distinct())
    val mergedRows = merged.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val wholeRows = whole.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(mergedRows == wholeRows,
      "bit_or-merged split sketches must equal the union's sketch")
    assert(wholeRows.nonEmpty && wholeRows.keys.max < (1 << 20) / 32,
      "word indexes must stay inside the fixed m/32 range")
  }

  test("d13's probe side broadcasts the sketch and never joins the corpus bulk") {
    val d = "/root/testdata/sf0.001"
    val d13 = DedupQueries.d13BloomIncremental.fn(spark, d)
    val p = d13.queryExecution.executedPlan.toString
    // the sketch is explicitly broadcast: probes must hash-join it
    // broadcast-side even with auto-broadcast disabled in this suite
    assert(p.contains("BroadcastHashJoin"),
      s"d13 must broadcast the sketch word table:\n$p")
  }

  test("Bloom probe picks its broadcast side by sketch size: a small sketch is hinted, a big one leaves the build side to runtime sizing") {
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val corpus = DedupQueries.BloomSketch.segmentHashesOf(
      docs.filter(col("doc_id") % 2 === 0)).select("h").distinct()
    // batch = ALL docs' segments: half the segments are corpus members
    // (must hit — a Bloom has no false negatives), half are not
    val batch = DedupQueries.BloomSketch.segmentHashesOf(docs)
    // at/below the broadcastable threshold the sketch side carries the
    // explicit hint — with auto-broadcast DISABLED in this suite, the
    // BroadcastHashJoin below can only come from the hint
    val mSmall = 1 << 20
    val small = DedupQueries.BloomSketch.probe(batch,
      DedupQueries.BloomSketch.sketchOf(corpus, mSmall), mSmall)
    assert(small.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "a small sketch must broadcast explicitly")
    // past it, NO forced side: neither a 50 MB sketch broadcast (the
    // round-13 screen wall regression) nor an unbounded batch-side
    // broadcast (the d13 corpus-fraction batch OOM) — under disabled
    // auto-broadcast that means no broadcast join at all; under AQE
    // (production) the runtime sizes pick the build side
    val mBig = 1 << 25
    val bigSketch = DedupQueries.BloomSketch.sketchOf(corpus, mBig)
    val big = DedupQueries.BloomSketch.probe(batch, bigSketch, mBig)
    assert(!big.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "an over-threshold sketch probe must not force a broadcast side")
    // and the unhinted path's verdicts stay sound: member segments can
    // NEVER miss (no false negatives at any modulus or join strategy)
    val members = corpus.collect().map(_.getString(0)).toSet
    val verdicts = big.collect()
      .map(r => (r.getString(1), r.getBoolean(2)))
    assert(verdicts.nonEmpty && verdicts.exists(v => members(v._1)))
    assert(verdicts.filter(v => members(v._1)).forall(_._2),
      "a member segment missed — the unhinted probe lost soundness")
  }

  test("d13 under AQE computes the shared probe aggregate once (stage reuse)") {
    // the probe aggregate feeds both the verify filter and the final
    // per-doc rollup; statically that subtree appears twice, and the
    // single-scan claim rests on AQE's query-stage cache deduplicating
    // the identical exchanges at runtime — assert it actually does
    val before = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val d13 = DedupQueries.d13BloomIncremental.fn(spark, "/root/testdata/sf0.001")
      d13.collect()
      val p = d13.queryExecution.explainString(
        org.apache.spark.sql.execution.ExtendedMode)
      assert("Reused".r.findAllIn(p).nonEmpty,
        s"expected AQE to reuse the shared probe stages:\n$p")
    } finally before.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the plan)") {
    // the third skew lever after salting (manual) and bucketing
    // (layout): AQE detects an oversized shuffle partition at RUNTIME
    // and splits it into parallel sub-partitions — the mechanism a
    // 100 TB join relies on when skew is discovered, not predicted.
    // Thresholds are lowered so the test's hot key (90% of one side)
    // trips the same code path a multi-GB partition would.
    val spark2 = spark
    import spark2.implicits._
    val before = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      // without force, AQE declines to split when downstream operators
      // would need an extra shuffle (e.g. a same-key aggregation after
      // the join) — force mirrors the production setting a skew-bound
      // pipeline flips when the re-shuffle is cheaper than the straggler
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // payload stays REFERENCED downstream (sum of lengths) so column
      // pruning can't strip it before the shuffle — a pruned hot
      // partition of identical longs compresses below any threshold
      val fact = (1 to 40000)
        .map(i => (if (i <= 36000) 1L else i.toLong,
          s"payload-$i-${i * 2654435761L}%x"))
        .toDF("k", "v")
      val dim = (1 to 40000).map(i => (i.toLong, i * 2.0)).toDF("k", "w")
      val joined = fact.join(dim, "k").groupBy("k")
        .agg(sum(length(col("v"))).as("bytes"))
      joined.collect() // AQE re-plans during execution
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot-key partition as skew-split:\n$p")
    } finally before.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("AQE coalesces small shuffle partitions") {
    val before = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag").count()
      val n = df.rdd.getNumPartitions
      assert(n <= 4, s"AQE should coalesce tiny shuffle output, got $n")
      assert(df.count() == 3)
    } finally before.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
  }
}
