package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_similarity

/** Microbench: native codegen'd CosineSimilarity vs the composed
  * zip_with+aggregate formulation, on the all-pairs cosine workload.
  * Prints one JSON line with both timings.
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    e.count()
    val pairs = e.alias("a").join(e.alias("b"),
      col("a.vec_id") < col("b.vec_id"))

    val composed = expr(
      """aggregate(zip_with(a.embedding, b.embedding,
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
        |/ (sqrt(aggregate(a.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |  * sqrt(aggregate(b.embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |""".stripMargin)
    val native = cosine_similarity(col("a.embedding"), col("b.embedding"))

    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      pairs.select(sum(c)).head()
      (System.nanoTime() - t0) / 1e9
    }

    time(native) // warmup both paths
    time(composed)
    val tn = time(native)
    val tc = time(composed)
    val n = e.count()
    println(f"""{"vectors":$n,"pairs":${n * (n - 1) / 2},"native_sec":$tn%.3f,"composed_sec":$tc%.3f,"speedup":${tc / tn}%.2f}""")
    spark.stop()
  }
}
