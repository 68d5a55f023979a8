package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Microbench: custom TopKPerKey operator vs the window row_number
  * formulation on the same workload (top-3 per nation over customer,
  * replicated to make the sort cost visible). Prints one JSON line.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val replicate = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replicate the table so per-partition sorting has real work;
    // perturb the sort key to keep cardinality high
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
      .crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .withColumn("bal", col("c_acctbal") + col("rep") * 0.001)
      .select(col("c_nationkey"), col("c_custkey"), col("bal"))
      .cache()
    val n = base.count()

    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    def windowRun(): Long = {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("bal").desc, col("c_custkey"))
      base.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).count()
    }

    def customRun(): Long =
      graft.plans.TopK.perKey(base, Seq("c_nationkey"),
        struct(negate(col("bal")), col("c_custkey")), k = 3).count()

    customRun(); windowRun() // warmup
    val tc = timeIt(customRun())
    val tw = timeIt(windowRun())
    println(f"""{"rows":$n,"window_sec":$tw%.3f,"custom_sec":$tc%.3f,"speedup":${tw / tc}%.2f}""")
    spark.stop()
  }
}
