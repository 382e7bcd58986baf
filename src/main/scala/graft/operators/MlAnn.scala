package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel, HashingTF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** MLlib surface: batch embedding pipeline + LSH ANN index build
  * (the `spark_approach` named in repo:BASELINE.json).
  *
  * Both paths are APPROXIMATE / engine-specific (murmur3 term hashing,
  * seeded random projections) so they carry no DuckDB oracle — the exact
  * twins (TextOps.hashEmbed, Knn.topK) are the correctness baseline, and
  * specs assert recall/consistency against them.
  *
  * Scale: `fit` only samples/plans (BRP-LSH fit draws random hyperplanes —
  * O(d·L), no data pass); transform is a map-only projection adding bucket
  * keys, and `approxSimilarityJoin` is an equi-join on (table, bucket) —
  * the same blocked-join shape as Dedup's banded MinHash.
  */
object MlAnn {

  /** RegexTokenizer → HashingTF(dim) → L2 Normalizer, materialized back to
    * an ARRAY<DOUBLE> column `outCol`. MLlib's murmur3-bucketed twin of
    * TextOps.hashEmbed.
    */
  def embedPipeline(docs: DataFrame, textCol: String, outCol: String,
                    dim: Int = 64): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__toks")
        .setPattern("[^a-z0-9]+").setToLowercase(true),
      new HashingTF().setInputCol("__toks").setOutputCol("__tf")
        .setNumFeatures(dim),
      new Normalizer().setInputCol("__tf").setOutputCol("__emb").setP(2.0)))
    pipe.fit(docs).transform(docs)
      .withColumn(outCol, vector_to_array(col("__emb")))
      .drop("__toks", "__tf", "__emb")
  }

  /** Fit a bucketed-random-projection LSH model over an ARRAY<FLOAT/DOUBLE>
    * embedding column (L2-normalized internally so euclidean buckets align
    * with cosine: cos = 1 − d²/2 on the unit sphere). Seeded →
    * deterministic.
    */
  def fitLsh(vecs: DataFrame, embCol: String, numTables: Int = 10,
             bucketLength: Double = 1.0, seed: Long = 42L):
      (BucketedRandomProjectionLSHModel, DataFrame) = {
    val prepared = vecs
      .withColumn("__norm", array_to_vector(VectorOps.l2Normalize(col(embCol))))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("__norm").setOutputCol("__hashes")
      .setNumHashTables(numTables).setBucketLength(bucketLength).setSeed(seed)
      .fit(prepared)
    (model, prepared)
  }

  /** Approximate top-k nearest neighbors of one stored vector by LSH bucket
    * probing; `distCol` is euclidean distance on the unit sphere.
    */
  def approxNeighbors(vecs: DataFrame, embCol: String, idCol: String,
                      queryId: Long, k: Int): DataFrame = {
    val (model, prepared) = fitLsh(vecs, embCol)
    val key = prepared.filter(col(idCol) === queryId)
      .select(col("__norm")).head().getAs[Vector](0)
    model.approxNearestNeighbors(
        prepared.filter(col(idCol) =!= queryId), key, k, "dist")
      .select(col(idCol), col("label"), round(col("dist"), 6).as("dist"))
      .orderBy(col("dist"), col(idCol))
  }

  /** Approximate similarity self-join: pairs within `maxDist` (euclidean on
    * the unit sphere; 0.6 ≈ cosine 0.82). Equi-join on LSH buckets — the
    * scalable near-dup shape.
    */
  def approxSelfJoin(vecs: DataFrame, embCol: String, idCol: String,
                     maxDist: Double): DataFrame = {
    val (model, prepared) = fitLsh(vecs, embCol)
    model.approxSimilarityJoin(prepared, prepared, maxDist, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(col("dist"), 6).as("dist"))
      .filter(col("id_a") < col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
