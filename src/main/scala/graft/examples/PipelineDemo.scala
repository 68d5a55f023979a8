package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** End-to-end training-data pipeline demo over the documents/embeddings
  * tables: quality stats → dedup clustering → keep list → token budget →
  * ANN spot-check. Every step is one of the gate-checked queries — this
  * main just strings them into the pipeline a corpus engineer would run.
  *
  * Run: sbt "runMain graft.examples.PipelineDemo [sfDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

    val nDocs = q("t01_token_stats").count()
    val dupPairs = q("d04_minhash_lsh").count()
    val clusters = q("d06_dedup_clusters")
    val nClustered = clusters.count()
    val nCanonical = clusters.filter(col("doc_id") === col("canonical_id")).count()
    val keep = q("d07_keep_list")
    val nKeep = keep.filter(col("keep")).count()
    val tokenBudget = q("t07_bpe_token_count")
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    val keptTokens = q("t07_bpe_token_count").alias("t")
      .join(keep.filter(col("keep")).alias("k"),
        col("t.doc_id") === col("k.doc_id"))
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)

    println(s"""
      |=== corpus report ($sfDir) ===
      |documents:                 $nDocs
      |near-dup pairs (J>=0.8):   $dupPairs
      |docs in dup clusters:      $nClustered (canonical survivors: $nCanonical)
      |keep after dedup+quality:  $nKeep / $nDocs
      |token budget (BPE-ish):    $tokenBudget total -> $keptTokens kept
      |""".stripMargin)

    println("ANN spot-check (query 0, IVF k-means vs exact):")
    q("e06_ann_ivf_kmeans").filter(col("query_id") === 0).show(3, false)
    q("e01_knn_bruteforce").filter(col("query_id") === 0).show(3, false)
    spark.stop()
  }
}
