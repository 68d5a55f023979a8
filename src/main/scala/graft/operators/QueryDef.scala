package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query exposed through [[graft.SparkEntry]].
  *
  * @param fn     builds the DataFrame from (session, scale-factor dir)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None → the driver records a weaker
  *               rows-only check (used for ops not expressible in SQL,
  *               e.g. MinHash-LSH dedup or provenance graph queries).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** DuckDB reads each table straight off the parquet file; the driver
    * substitutes nothing, so oracle SQL references tables by
    * `read_parquet('<dir>/<name>.parquet')` — except the driver register
    * tables by name. We emit plain table names (driver creates views).
    */
  def sqlTable(name: String): String = name

  /** Spread a compute-heavy derivation's LEAF-SCAN input across all
    * cores when the scan is narrower than the machine (guide §2.6 —
    * idle capacity; round-16 profile: d09's 64-hash MinHash signatures
    * and d12's per-position md5 grams ran 2–3 s of task time on the 4
    * partitions one small parquet file splits into, while 28 cores
    * idled). SCALE-ADAPTIVE by construction, not a local[32] constant:
    * the partition count is derived from the input — a production scan
    * with more splits than cores returns unchanged (zero cost at
    * 100 TB, where the repartition would be a full-corpus shuffle);
    * only a scan too narrow to feed the machine is widened, and what
    * shuffles then is by definition small. Call ONLY on leaf scans
    * (`Tables.*` reads + narrow projections): `rdd.getNumPartitions`
    * on a plan with exchanges would force AQE stage materialization.
    */
  private[graft] def scaleOut(base: DataFrame): DataFrame = {
    val target = base.sparkSession.sparkContext.defaultParallelism
    if (base.rdd.getNumPartitions >= target) base
    else base.repartition(target)
  }

  /** Opt-in guard for the documented QUADRATIC baselines (d03 exact
    * n-gram Jaccard, e02 all-pairs cosine): their scaladoc forbids them
    * on the scale path, but nothing used to stop a composition from
    * calling them on a big input. Inputs above
    * `spark.graft.quadraticMaxRows` (default 50 000) now throw with a
    * pointer at the scale-path equivalent unless the caller explicitly
    * sets `spark.graft.allowQuadratic=true`. The guard costs one count
    * JOB on the base table at plan-build time (for a plain parquet scan
    * it reduces to footer row-counts) — noise next to the O(n²) job it
    * fences, and the opt-in conf skips even that.
    */
  private[operators] def requireQuadraticOptIn(
      base: DataFrame, op: String, scalePath: String): DataFrame = {
    val conf = base.sparkSession.conf
    def parsed[T](key: String, parse: String => T, kind: String): Option[T] =
      conf.getOption(key).map { v =>
        try parse(v) catch {
          case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"$key must be a $kind; got '$v'")
        }
      }
    val allow =
      parsed("spark.graft.allowQuadratic", _.toBoolean, "boolean")
        .getOrElse(false)
    if (!allow) {
      val maxRows =
        parsed("spark.graft.quadraticMaxRows", _.toLong, "long")
          .getOrElse(50000L)
      val n = base.count()
      require(n <= maxRows,
        s"$op is an exact quadratic baseline (O(n^2) pairs) guarded above " +
          s"$maxRows input rows (got $n). Use $scalePath on the scale " +
          "path, or opt in with spark.graft.allowQuadratic=true / raise " +
          "spark.graft.quadraticMaxRows.")
    }
    base
  }
}
