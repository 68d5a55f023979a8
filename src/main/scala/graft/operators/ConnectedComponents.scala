package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by hook + shortcut (Shiloach-Vishkin
  * style): every node repeatedly takes the min label among itself and
  * its neighbors (hook), then jumps to its label's label (shortcut).
  * The shortcut halves pointer-chain depth each round, so convergence is
  * O(log n) distributed rounds even on path-shaped components — plain
  * neighbor-min propagation needs O(diameter). Each round is three
  * shuffles (edge join, groupBy min, label self-join) over datasets that
  * shrink to one row per node; at cluster scale rounds dominate, not
  * per-round width.
  */
object ConnectedComponents {

  final case class Result(labels: DataFrame, rounds: Int)

  /** @param pairs undirected edges as columns (da, db)
    * @return (doc_id, label) with label = component's min node id
    */
  def run(pairs: DataFrame, maxRounds: Int = 50): Result = {
    val edges = pairs
      .unionByName(pairs.select(col("db").as("da"), col("da").as("db")))
    var labels = edges.select(col("da").as("doc_id"))
      .union(edges.select(col("db").as("doc_id"))).distinct()
      .withColumn("label", col("doc_id"))
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      rounds += 1
      // hook: min label among self and neighbors
      val nbrMin = edges
        .join(labels, edges("db") === labels("doc_id"))
        .groupBy(col("da")).agg(min(col("label")).as("nbr_label"))
      val hooked = labels.join(nbrMin, labels("doc_id") === nbrMin("da"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
      // shortcut: label ← label(label). localCheckpoint (not cache)
      // truncates the logical plan each round — otherwise the plan
      // nests one level per iteration and analysis/planning time grows
      // superlinearly with rounds
      val next = hooked.alias("a")
        .join(hooked.select(col("doc_id").as("ld"), col("label").as("ll")).alias("b"),
          col("a.label") === col("ld"), "left")
        .select(col("doc_id"),
          least(col("a.label"), coalesce(col("ll"), col("a.label"))).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).limit(1).count() > 0
      labels.unpersist() // release the superseded round's blocks
      labels = next
    }
    // fail loudly rather than emit a partial closure
    require(!changed,
      s"connected components did not converge within $maxRounds rounds")
    Result(labels, rounds)
  }
}
