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
}
