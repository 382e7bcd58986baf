package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.MlAnn

class MlAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("embed_mllib: unit L2 norm per doc, deterministic across runs") {
    val out = MlAnn.embedPipeline(Tables.documents(spark, sf), "text", "emb")
    val norms = out.select(VectorOps.norm(col("emb")).as("n")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val a = out.select(col("doc_id"), col("emb")).collect().map(_.toString).sorted
    val b = MlAnn.embedPipeline(Tables.documents(spark, sf), "text", "emb")
      .select(col("doc_id"), col("emb")).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("ann_lsh: k results, distances ascending, decent recall vs exact knn") {
    val approx = SparkEntry.queries("ann_lsh")(spark, sf).collect()
    assert(approx.length === 5)
    val dists = approx.map(_.getAs[Double]("dist"))
    assert(dists.sameElements(dists.sorted))
    // exact top-5 by cosine == top-5 by euclidean on normalized vectors
    val exact = SparkEntry.queries("knn_topk")(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val got = approx.map(_.getAs[Long]("vec_id")).toSet
    assert((exact & got).size >= 2, s"recall too low: exact=$exact approx=$got")
  }

  test("layout-served LSH search matches MLlib's own approxNearestNeighbors") {
    val fromLayout = graft.operators.MlAnn.lshSearchLayout(spark, sf, 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val fromModel = graft.operators.MlAnn
      .approxNeighbors(Tables.embeddings(spark, sf), "embedding", "vec_id", 0L, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(fromLayout.toSeq === fromModel.toSeq,
      s"dumped-index search diverged from the model probe: " +
        s"${fromLayout.toSeq} vs ${fromModel.toSeq}")
  }

  test("dumped term→bucket map matches HashingTF.indexOf exactly") {
    // the mapping is now computed distributed (UDF over the distinct-terms
    // frame — no driver collect of the vocabulary); this pins that the
    // dumped table still equals HashingTF's own hash for every term
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(64)
    val dumped = spark.read.parquet(MlAnn.tfBucketsLayout(spark, sf))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(dumped.nonEmpty)
    dumped.foreach { case (term, bucket) =>
      assert(bucket === tf.indexOf(term), s"bucket drift for term '$term'")
    }
  }

  test("approxSelfJoin: returned pairs respect the distance bound") {
    val pairs = MlAnn.approxSelfJoin(
      Tables.embeddings(spark, sf).limit(100), "embedding", "vec_id", maxDist = 1.2)
    val rows = pairs.collect()
    rows.foreach(r => assert(r.getAs[Double]("dist") <= 1.2))
  }
}
