package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** SemDeDup — semantic deduplication via embedding clustering (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540).
  *
  * The published recipe for near-duplicate pruning at web scale when the
  * duplicates are PARAPHRASES rather than byte-level copies (where the
  * MinHash/SimHash families in [[Dedup]] are blind): k-means-cluster the
  * corpus embeddings, then compare pairs ONLY within a cluster — the
  * cluster assignment is the blocking key, so the quadratic pair space
  * shrinks from O(N²) to O(Σ|cell|²), and k is chosen so cells stay
  * cap-sized (the paper uses k = 50,000 over ~1e8 items; cells are a few
  * thousand rows — the same bounded-block discipline as the 256-user cap
  * on the co-occurrence graph build in [[Triangles]]).
  *
  * Spark shape: the trained IVF layout ([[Ann.kmeansLayout]]) IS the
  * clustering — SemDeDup rides the same one-time index build the ANN
  * family serves from, so the cluster assignment costs nothing extra here.
  * The within-cell pair search is a self-equi-join on the cell key (one
  * shuffle each side, never a cartesian), and only (id, embedding, cell)
  * rows move — text never shuffles.
  *
  * Keeper policy divergence from the paper (documented): the paper keeps
  * the item with the lowest similarity to the cluster centroid inside each
  * duplicate group, a sequential greedy that is not replayable in set
  * semantics. We use keep-first-by-id — an item is a duplicate iff a
  * SMALLER-id item in the same cell is within the similarity threshold —
  * matching the `dedup_keep_first` semantics used across the dedup family
  * and making the verdict an oracle-replayable pure function of the dumped
  * layout. The candidate pair set is identical to the paper's.
  */
object SemDedup {

  /** Within-cell near-duplicate pairs: (id_a < id_b, same cell,
    * round(cosine, 6) >= tau). Rounding BEFORE the threshold keeps the
    * boundary decision engine-portable (same convention as
    * [[Knn.similaritySelfJoin]]).
    */
  def withinCellPairs(vecs: DataFrame, idCol: String, embCol: String,
                      cellCol: String, tau: Double): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val a = vecs.select(col(idCol).as("id_a"), col(embCol).as("emb_a"),
      col(cellCol).as("cell"))
    val b = vecs.select(col(idCol).as("id_b"), col(embCol).as("emb_b"),
      col(cellCol).as("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(GraftFunctions.cosineSim(col("emb_a"), col("emb_b")), 6))
      .filter(col("sim") >= tau)
      .select(col("cell"), col("id_a"), col("id_b"), col("sim"))
  }

  /** Per-item verdict over a clustered layout: (id, cell, witness, is_dup)
    * where `witness` is the smallest same-cell id within `tau` (NULL for
    * kept items) and `is_dup` = 1 iff such a witness exists. Keeping the
    * `is_dup = 0` rows is the SemDeDup-pruned corpus.
    */
  def verdicts(vecs: DataFrame, idCol: String, embCol: String,
               cellCol: String, tau: Double): DataFrame = {
    val wit = withinCellPairs(vecs, idCol, embCol, cellCol, tau)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("witness"))
    vecs.select(col(idCol), col(cellCol))
      .join(wit, col(idCol) === col("id_b"), "left")
      .select(col(idCol), col(cellCol), col("witness"),
        when(col("witness").isNotNull, 1).otherwise(0).as("is_dup"))
  }
}
