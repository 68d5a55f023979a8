package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement helper (guide §1): run named queries through the bench's
  * exact session + noop sink and report, per query, the wall time next
  * to the scheduler-side costs the wall hides — #jobs (each a driver
  * round-trip), #stages (each a scheduling barrier; stages - jobs ≈
  * shuffle count), #tasks, summed task time, and summed shuffle bytes.
  * A query whose wall time dwarfs its task time is bounded by fixed
  * per-job/per-stage costs (driver planning, localCheckpoint actions,
  * collect round-trips), not by compute — the distributed-algorithm
  * lever (guide §1.2 step 1), not the per-task one.
  *
  * Usage: runMain graft.Profile <sfDir> <query1> [query2 ...]
  * (defaults to the bench headline set; 2 timed reps after 1 warmup).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val names = if (args.length > 1) args.tail.toSeq else Bench.headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    runOnce("q01_pricing_summary") // JVM/codegen warmup

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s " +
      f"${"tasks"}%6s ${"task_s"}%8s ${"shuf_MB"}%8s")
    names.foreach { n =>
      runOnce(n) // per-query warm (plans/codegen cached per shape)
      jobs.set(0); stages.set(0); tasks.set(0)
      taskMs.set(0); shufRead.set(0); shufWrite.set(0)
      val wall = runOnce(n)
      Thread.sleep(400) // listener events are async; let the bus drain
      println(f"$n%-28s $wall%8.3f ${jobs.get}%5d ${stages.get}%6d " +
        f"${tasks.get}%6d ${taskMs.get / 1e3}%8.2f " +
        f"${(shufRead.get + shufWrite.get) / 1e6}%8.2f")
    }
    spark.stop()
  }
}
