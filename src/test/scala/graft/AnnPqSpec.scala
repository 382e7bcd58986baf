package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.operators.{Knn, Pq}

/** Quality gate for the product-quantization path (rows-only query —
  * trained codebooks are engine-specific, so correctness is asserted here
  * rather than against DuckDB).
  */
class AnnPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def normed = Tables.embeddings(spark, sf)
    .select(col("vec_id"),
      VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("nemb"))

  test("codes are well-formed, deterministic, and the codebooks reconstruct better than chance") {
    val cb = Pq.train(spark, sf)
    assert(cb.m === 8 && cb.subDim === 8 && cb.books.forall(_.length === 16))
    val enc = Pq.encode(normed, "nemb", cb)
    val rows = enc.select(col("vec_id"), col("codes")).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 8 && codes.forall(c => c >= 0 && c < 16))
    }
    // deterministic: a second encode pass yields identical codes
    val again = Pq.encode(normed, "nemb", cb)
      .select(col("vec_id"), col("codes")).collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Int](1))).toMap ===
      again.map(r => (r.getLong(0), r.getSeq[Int](1))).toMap)
    // reconstruction: mean cosine(original, decoded centroids) must beat
    // a random-codebook strawman by a wide margin (sanity floor 0.5)
    val bcCb = spark.sparkContext.broadcast(cb)
    val recon = udf { (codes: Seq[Int]) =>
      val c = bcCb.value
      val out = new Array[Double](c.m * c.subDim)
      var s = 0
      while (s < c.m) {
        System.arraycopy(c.books(s)(codes(s)), 0, out, s * c.subDim, c.subDim)
        s += 1
      }
      out
    }
    val meanCos = enc.withColumn("rec", recon(col("codes")))
      .select(avg(VectorOps.cosine(col("nemb"), col("rec"))).as("c"))
      .head().getDouble(0)
    info(f"mean reconstruction cosine: $meanCos%.3f")
    assert(meanCos > 0.5, s"codebooks reconstruct at cosine $meanCos")
  }

  test("ADC shortlist + exact rescore recovers most exact neighbors") {
    val cb = Pq.train(spark, sf)
    val recalls = (0L until 5L).map { qid =>
      val qn = normed.filter(col("vec_id") === qid).head().getSeq[Double](1).toArray
      val q = Tables.embeddings(spark, sf).filter(col("vec_id") === qid)
        .select(col("embedding").as("q_emb"))
      val exact = Knn.topK(
          Tables.embeddings(spark, sf).filter(col("vec_id") =!= qid), q,
          "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
        .collect().map(_.getLong(0)).toSet
      val table = Pq.adcTable(qn, cb)
      val short = Pq.encode(normed.filter(col("vec_id") =!= qid), "nemb", cb)
        .withColumn("adc", round(Pq.adcScore(table, cb.m), 6))
        .orderBy(col("adc").desc, col("vec_id").asc).limit(20)
      val rerank = short.crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("nemb"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        .collect().map(_.getLong(0)).toSet
      exact.count(rerank).toDouble / 5.0
    }
    val mean = recalls.sum / recalls.size
    info(s"PQ ADC recall@5 over 5 queries: $recalls (mean $mean)")
    assert(mean >= 0.3, s"PQ recall collapsed: $mean")
  }
}
