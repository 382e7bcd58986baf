package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries, TextQueries, TrainQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names, total ORDER BY, double math, fixed rounding) unless
  * the operator is not SQL-expressible, in which case the driver records a
  * weaker rows-only check. Queries are grouped by family under
  * graft.queries.*.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-5 nearest neighbors (cosine) of vector 0 in the embeddings corpus —
    * the reference's POST /api/search re-expressed as a Spark plan
    * (TakeOrderedAndProject over a broadcast-scored scan).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.queries ++ RelationalQueries.queries ++ TextQueries.queries ++ PipelineQueries.queries ++ TrainQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    VectorQueries.oracles ++ RelationalQueries.oracles ++ TextQueries.oracles ++ PipelineQueries.oracles ++ TrainQueries.oracles
}
