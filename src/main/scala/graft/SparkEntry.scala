package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's demo query (SURVEY §2 coverage)
  * plus its DuckDB oracle SQL. Query name groups:
  *   - q*  relational SQL surface (SURVEY §2.2)
  *   - m*  DML mutation layer (INSERT/UPDATE/DELETE on views)
  *   - src* file sources/sinks round-trips (SURVEY §2.1 S1–S17)
  *   - d*  dedup operators, s* similarity, t* text analysis,
  *     mm* multimodal, e* event/time windowing (pipeline extension tier)
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ SourceQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ SourceQueries.oracleSql ++ PipelineQueries.oracleSql
}
