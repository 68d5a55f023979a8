package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.GraftFunctions.cosine_similarity

/** Streaming vector-search serving — the deployment shape of the batch
  * ANN operators (e05's IVF index queried by an unbounded stream of
  * embeddings, the way a retrieval service sees queries one at a time
  * rather than as a batch column).
  */
object EmbStreams {

  final case class EmbQuery(query_id: Long, ts: Timestamp,
                            embedding: Seq[Float])
  final case class AnnHit(query_id: Long, rank: Long, neighbor_id: Long,
                          cos: Double)

  /** Serve an unbounded query stream against a STATIC IVF index (the
    * cell-assigned corpus + driver-pulled centroids from
    * [[graft.operators.SimilarityQueries.ivfIndex]] — the same
    * building blocks the e05 gate verifies, so serving searches the
    * gated index).
    *
    * Plan shape: cell probing is a pure projection — the ≤ #cells
    * centroids ride as literals and each query explodes into its
    * `nprobe` best cells via an in-row struct sort (no window, which
    * streams cannot run; ties on centroid cosine break toward the
    * higher cell id, vanishingly rare on real-valued embeddings) —
    * then ONE stream-static equi-join on `cell` scores the query
    * against its probed cells only, and a per-query group emits the
    * exact top-k. State: none retained (NoTimeout, state never set) —
    * each query's candidates arrive in its own micro-batch, so the
    * stateful operator is just a per-group top-k pass. At scale the
    * static side is the corpus BUCKETED by cell, so each micro-batch's
    * join touches only the probed cells' buckets; per-query work is
    * O(corpus × nprobe / #cells), the same bound the batch gate
    * certifies. Agreement with batch e05 on the same query set is
    * spec-proven (EmbStreamsSpec), including the shared
    * half-up 6-decimal cosine rounding.
    */
  def ivfServe(queries: Dataset[EmbQuery], assigned: DataFrame,
               centroids: Seq[(Int, Array[Float])],
               nprobe: Int = 2, k: Int = 3): Dataset[AnnHit] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val probeCos = centroids.map { case (cell, c) =>
      struct(
        cosine_similarity(col("embedding"),
          array(c.map(v => lit(v)): _*).cast("array<float>")).as("cs"),
        lit(cell).as("cell"))
    }
    val probes = queries.toDF()
      .select(col("query_id"), col("embedding").as("q_emb"),
        explode(slice(reverse(array_sort(array(probeCos: _*))), 1, nprobe))
          .as("p"))
      .select(col("query_id"), col("q_emb"), col("p.cell").as("cell"))
    // EXPLICIT broadcast of the per-batch probe side: the micro-batch
    // planner has no stats for a MicroBatchScan, so without the hint it
    // falls back to a sort-merge join that re-shuffles the corpus every
    // trigger (EmbStreamsSpec asserts the shape)
    val scored = broadcast(probes)
      .join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("q_emb"), col("embedding")).as("cos"))
      .as[(Long, Long, Double)]
    scored.groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, AnnHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (qid: Long, rows: Iterator[(Long, Long, Double)], _) =>
          // same ordering and rounding protocol as the batch
          // probeAndRank: cos desc, neighbor_id asc; scala-BigDecimal
          // half-up matches Spark's round() on doubles
          rows.toSeq.sortBy(r => (-r._3, r._2)).take(k)
            .iterator.zipWithIndex.map { case ((_, nid, cos), i) =>
              AnnHit(qid, i + 1L, nid,
                BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble)
            }
      }
  }
}
