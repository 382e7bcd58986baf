package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.functions.VectorOps

/** Brute-force exact k-nearest-neighbor search, Spark-shaped.
  *
  * Reference behavior (DotNetVectorSearch.WebAPI/Services/VectorSearchService.cs:173-217):
  * score the query against EVERY corpus vector, sort desc, take k. The
  * reference does an O(N log N) full sort in app memory; here `orderBy.limit`
  * plans as TakeOrderedAndProjectExec — a bounded per-partition priority
  * queue + driver merge, O(N log k) and no shuffle of the full corpus. On a
  * 1000-executor cluster each partition returns at most k rows to the driver.
  *
  * Tie-breaking: the reference's LINQ sort is stable (ties keep id order);
  * Spark's is not, so the canonical ordering is (sim DESC, id ASC) — see
  * SURVEY.md §2A fine-print 2.
  */
object Knn {

  /** Top-k rows of `corpus` most cosine-similar to the single vector in
    * `query` (a 1-row DataFrame with column `q_emb`). The query side is
    * broadcast — a degenerate broadcast nested-loop join, which is exactly
    * the right physical plan: the big side streams, nothing shuffles.
    *
    * `sim` is rounded to 6 decimals BEFORE ranking so that ordering is
    * reproducible across engines (oracle parity) and across partitionings.
    */
  def topK(corpus: DataFrame, query: DataFrame, idCol: String, embCol: String,
           k: Int, keep: Seq[String]): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(query))
      .withColumn("sim", round(GraftFunctions.cosineSim(col(embCol), col("q_emb")), 6))
    scored
      .select((keep.map(col) :+ col("sim")): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch variant: many query vectors at once (generalizing the reference's
    * one-query-per-HTTP-request loop into a single distributed job).
    * `queries` has (qid, q_emb). Small query side is broadcast; ranking is a
    * per-query window — the only shuffle is by qid, and with a broadcast
    * join the scan side never moves until the rank.
    *
    * For very large query batches at 100 TB scale, flip the broadcast side
    * or pre-bucket both sides on a shared LSH bucket (see Ann) to avoid the
    * full cross product.
    */
  def topKBatch(corpus: DataFrame, queries: DataFrame, corpusId: String,
                embCol: String, k: Int, keep: Seq[String]): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))  // every (corpus row, query row)
      .withColumn("sim", round(GraftFunctions.cosineSim(col(embCol), col("q_emb")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col(corpusId).asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select((col("qid") +: keep.map(col) :+ col("sim") :+ col("rnk")): _*)
  }

  /** Similarity self-join: all pairs (a, b) with a.id < b.id and
    * cosine >= threshold. Exact N² variant — correct at test scale and the
    * correctness oracle for the LSH variant. `blockCol`, when set, restricts
    * pairs to equal values of that column (candidate blocking), turning the
    * cross join into an equi-join that shuffles by block instead of
    * broadcasting everything — the scalable shape.
    */
  def similaritySelfJoin(vecs: DataFrame, idCol: String, embCol: String,
                         threshold: Double, blockCol: Option[String] = None): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(embCol).as("emb_a"),
      blockCol.map(col(_).as("blk_a")).getOrElse(lit(0).as("blk_a")))
    val b = vecs.select(col(idCol).as("id_b"), col(embCol).as("emb_b"),
      blockCol.map(col(_).as("blk_b")).getOrElse(lit(0).as("blk_b")))
    GraftFunctions.register(vecs.sparkSession)
    a.join(b, col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("sim", round(GraftFunctions.cosineSim(col("emb_a"), col("emb_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
