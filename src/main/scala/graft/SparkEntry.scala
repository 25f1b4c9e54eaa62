package graft

import graft.queries.{CoreQueries, ExtraQueries, FunctionQueries, LlmQueries, RelationalQueries, StatQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (one entry per
  * implemented operator from SURVEY.md §2 plus the LLM-pipeline
  * extensions); `oracleSql` holds the DuckDB-equivalent SQL for every
  * SQL-expressible query (hash-based dedup/ANN operators get the driver's
  * rows-only check and are invariant-tested in ScalaTest instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — scan, expression map, partial+final aggregation.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ RelationalQueries.queries ++ FunctionQueries.queries ++
      LlmQueries.queries ++ ExtraQueries.queries ++ StatQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ RelationalQueries.oracles ++ FunctionQueries.oracles ++
      LlmQueries.oracles ++ ExtraQueries.oracles ++ StatQueries.oracles
}
