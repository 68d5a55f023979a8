package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout for the driver
  * (BENCH_r{N}.json). Times the headline queries at
  * SPARK_GRAFT_SF_DIR with full materialization through the noop sink
  * (count() would let Catalyst prune the very work being measured).
  */
object Bench {

  /** Headline set: core joins/aggs, windows, events, dedup (exact +
    * MinHash-LSH), ANN, fingerprinting — the operators whose cost
    * dominates a real pipeline.
    */
  val defaultHeadline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_agg", "q05_nation_revenue",
    "q17_window_rank", "q18_window_running", "q28_events_hourly",
    "d01_exact_dedup", "d04_minhash_lsh", "e01_knn_bruteforce",
    "t04_fingerprint", "q42_topk_per_key_custom")

  /** Override with SPARK_GRAFT_BENCH_QUERIES=name1,name2 for ad-hoc runs;
    * a name may repeat to measure warm-plan cost.
    */
  def headline: Seq[String] =
    sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(defaultHeadline)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    // min of two runs per query: steady-state throughput, insulated
    // from transient machine load and one-time-per-JVM codegen costs
    // (both amortize over a real workload's lifetime)
    val results = headline.map { n =>
      val a = runOnce(n)
      val b = runOnce(n)
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":2,"agg":"min","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
