package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout for the driver
  * (BENCH_r{N}.json). Times the headline queries at
  * SPARK_GRAFT_SF_DIR with full materialization through the noop sink
  * (count() would let Catalyst prune the very work being measured).
  */
object Bench {

  /** Headline set: core joins/aggs, windows, events, dedup (exact +
    * MinHash-LSH + capped LSH + segment-level), ANN (brute force + PQ),
    * fingerprinting, sequence packing, and the C4 composite filter —
    * one representative per family whose cost dominates a real
    * pipeline, so a regression in any family moves the total.
    */
  val defaultHeadline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_agg", "q05_nation_revenue",
    "q17_window_rank", "q18_window_running", "q28_events_hourly",
    "d01_exact_dedup", "d04_minhash_lsh", "d09_minhash_lsh_capped",
    "d10_segment_dedup", "e01_knn_bruteforce", "e09_ann_pq",
    "t04_fingerprint", "t11_sequence_packing", "t15_c4_filter",
    "q42_topk_per_key_custom")

  /** Override with SPARK_GRAFT_BENCH_QUERIES=name1,name2 for ad-hoc runs;
    * a name may repeat to measure warm-plan cost.
    */
  def headline: Seq[String] =
    sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(defaultHeadline)

  /** 1-minute load average as an idle-machine guard: a loaded box adds
    * noise min-of-N can't fully reject, so the JSON carries the load at
    * start and a stderr warning fires above `cpus` — the r3→r2 +12%
    * "drift" question this answers was machine contention, not code.
    */
  private def loadAvg1m(): Double =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      s.split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // wide multi-agg plans (d04's 64 minhash columns) pay quadratic
      // planning in constraint propagation; correctness is unaffected
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val startLoad = loadAvg1m()
    if (startLoad > cpus.toDouble)
      System.err.println(f"[bench] WARNING: 1m load $startLoad%.1f exceeds " +
        s"$cpus cpus — timings will be contended, rerun on an idle machine")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      } finally {
        spark.catalog.clearCache()
      }
    }

    // warmup: absorb JVM/codegen/first-parquet-footer costs
    runOnce("q01_pricing_summary")

    // min of N runs per query: steady-state throughput, insulated from
    // transient machine load and one-time-per-JVM codegen costs (both
    // amortize over a real workload's lifetime); the per-query relative
    // spread (max-min)/min is reported so environmental drift between
    // rounds is visible instead of argued about
    val results = headline.map { n =>
      val times = (1 to nRuns).map(_ => runOnce(n)).filter(_ >= 0)
      if (times.isEmpty) n -> (-1.0, -1.0)
      else n -> (times.min,
        if (times.min == 0.0) 0.0 else (times.max - times.min) / times.min)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Locale.ROOT: the f-interpolator honors the default JVM locale, and a
    // comma-decimal locale would emit invalid JSON ("0,123")
    val spreads = results.map { case (k, (_, s)) =>
      "\"" + k + "\":" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$nRuns,"agg":"min","load_1m":$startLoad,"queries":$qs,"rel_spread":$spreads,"sf":"$sfDir"}""")
    spark.stop()
  }
}
