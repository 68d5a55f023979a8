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
