package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-module registries under
  * [[graft.operators]]; each [[QueryDef]] pairs the Spark implementation
  * with a DuckDB oracle (where SQL-expressible).
  */
object SparkEntry {

  private def registry: Seq[QueryDef] =
    RelationalQueries.all ++ SetOpQueries.all ++ AggQueries.all ++
      WindowQueries.all ++ EventsQueries.all ++ FuncQueries.all ++
      TypedQueries.all ++ ProvShowcaseQueries.all ++ FileGroupShowcaseQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ TextAnalysisQueries.all ++
      MultimodalQueries.all ++ SqlSurfaceQueries.all ++ ScaleOpQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
