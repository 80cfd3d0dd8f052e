package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{MultimodalQueries, PipelineQueries, RelationalQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY §2 pipeline
  * parity + relational/LLM-pipeline extensions); `oracleSql` holds the
  * DuckDB-equivalent SQL for the driver's hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference pipeline analog (parse → transform → route → agg).
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.pipeRoute(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.defs ++ RelationalQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs ++ MultimodalQueries.defs

  def oracleSql: Map[String, String] =
    PipelineQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ MultimodalQueries.oracles
}
