package graft

import org.apache.spark.sql.SparkSession

import graft.prov._

/** Provenance-overhead measurement (BASELINE.md: "measured and
  * reported"): the same pipeline (parallelize → map → filter →
  * reduceByKey → collect) with capture ON vs OFF.
  * Prints one JSON line: {"off_sec":…,"on_sec":…,"overhead_factor":…}.
  */
object ProvBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val data = (0 until n).map(i => s"k${i % 1000};$i")

    // a 20M-row capture run writes a ~4 GB element store; keeping every
    // run's store alive exhausts the disk before the x100 cell finishes
    def rmrf(dir: String): Unit = {
      import java.nio.file._
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }

    def pipeline(capture: Boolean, async: Boolean = false): Double = {
      val store = java.nio.file.Files.createTempDirectory("provbench").toString
      val s = ProvSession.create(spark, "bench", store, captureEnabled = capture,
        asyncFlush = async)
      val t0 = System.nanoTime()
      val out = s.parallelize(data)
        .map { line => val p = line.split(";"); (p(0), p(1).toLong) }
        .filter(_._2 % 3 != 0)
        .reduceByKey(_ + _)
        .collect()
      s.close()
      require(out.length == 1000)
      val dt = (System.nanoTime() - t0) / 1e9
      rmrf(store)
      dt
    }

    // min-of-N steady state (same philosophy as Bench.scala): the first
    // capture-ON run pays one-time JIT/codegen for the cache-encode and
    // element-write plans that a long-lived session amortizes; each run
    // still uses a FRESH session + store, so no data cache carries over
    val nRuns = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    def best(f: => Double): Double = { f; (1 to nRuns).map(_ => f).min }
    val off = best(pipeline(capture = false))
    val on = best(pipeline(capture = true))
    val onAsync = best(pipeline(capture = true, async = true))

    // relational layer: same logical pipeline (scan → project → filter →
    // groupBy-agg) as ProvFrame combinators vs the bare DataFrame plan.
    // Deterministic ids mean NO stage caching — the capture cost is the
    // prov-column arithmetic + the flush job, nothing resident.
    import org.apache.spark.sql.functions._
    val src = data.map { line =>
      val p = line.split(";"); (p(0), p(1).toLong)
    }.toDF("k", "v")
    src.write.mode("overwrite").parquet("/tmp/provbench_rel")
    def relational(capture: Boolean, async: Boolean = false,
                   granularity: RelationalProvenance.Granularity =
                     RelationalProvenance.Granularity.Element): Double = {
      val store = java.nio.file.Files.createTempDirectory("provbenchrel").toString
      val t0 = System.nanoTime()
      val df = spark.read.parquet("/tmp/provbench_rel")
      val out = if (capture) {
        val s = ProvSession.create(spark, "bench-rel", store, asyncFlush = async)
        val f = RelationalProvenance.table(s, df, "src", Seq("k", "v"),
            granularity)
          .select("widen")(col("k"), col("v"), (col("v") * 2).as("v2"))
          .filter(col("v") % 3 =!= 0)
          .groupByAgg(Seq(col("k")), Seq(sum(col("v2")).as("s")))
        val r = f.result.collect()
        s.close()
        r
      } else {
        df.select(col("k"), col("v"), (col("v") * 2).as("v2"))
          .filter(col("v") % 3 =!= 0)
          .groupBy(col("k")).agg(sum(col("v2")).as("s"))
          .collect()
      }
      require(out.length == 1000)
      val dt = (System.nanoTime() - t0) / 1e9
      rmrf(store)
      dt
    }
    val relOff = best(relational(capture = false))
    val relOn = best(relational(capture = true))
    val relOnAsync = best(relational(capture = true, async = true))
    // task granularity: the 20M-row scale lever — task graph + per-task
    // row counts, zero per-row elements (PARITY "relational capture at
    // scale")
    val relTask = best(relational(capture = true,
      granularity = RelationalProvenance.Granularity.Task))
    println(f"""{"rows":$n,"off_sec":$off%.3f,"on_sec":$on%.3f,"on_async_sec":$onAsync%.3f,"overhead_factor":${on / off}%.2f,"async_overhead_factor":${onAsync / off}%.2f,"rel_off_sec":$relOff%.3f,"rel_on_sec":$relOn%.3f,"rel_on_async_sec":$relOnAsync%.3f,"rel_overhead_factor":${relOn / relOff}%.2f,"rel_async_overhead_factor":${relOnAsync / relOff}%.2f,"rel_task_on_sec":$relTask%.3f,"rel_task_overhead_factor":${relTask / relOff}%.2f}""")
    spark.stop()
  }
}
