package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Knn
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names, total ORDER BY, double math, fixed rounding) unless
  * the operator is not SQL-expressible, in which case the driver records a
  * weaker rows-only check.
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
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------------------------------------
    // Vector search surface (reference parity, SURVEY.md §2A O13-O16)
    // ------------------------------------------------------------------

    // O14: brute-force exact top-k by cosine similarity, query = vec_id 0.
    "knn_topk" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding",
        k = 5, keep = Seq("vec_id", "label"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "knn_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.qe)
        |    / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |     * sqrt(list_dot_product(q.qe, q.qe))), 6) AS sim
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> 0
        |ORDER BY sim DESC, e.vec_id ASC
        |LIMIT 5""".stripMargin
  )
}
