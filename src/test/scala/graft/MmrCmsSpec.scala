package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CountMin, Mmr}

/** MMR rerank semantics + count-min sketch guarantees. */
class MmrCmsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("MMR: first pick is the plain cosine top-1; picks are distinct shortlist members") {
    val out = Mmr.rerank(spark, sf, qId = 0L, k = 5, shortlistN = 20,
      lam = 0.7, mu = 0.3).collect()
    assert(out.length === 5)
    assert(out.map(_.getLong(1)).distinct.length === 5)
    val top1 = graft.SparkEntry.queries("knn_topk")(spark, sf)
      .orderBy(col("sim").desc, col("vec_id").asc).head.getLong(0)
    assert(out.head.getLong(1) === top1)
  }

  test("MMR: a redundant near-duplicate of pick 1 is demoted below a diverse candidate") {
    import spark.implicits._
    // a and a2 are near-identical and closest to q; b is distinct but
    // still relevant. Plain top-2 = (a, a2); MMR must pick (a, b).
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),          // query
      (1L, Array(0.99f, 0.1f, 0.0f)),         // a
      (2L, Array(0.99f, 0.11f, 0.0f)),        // a2 ~ duplicate of a
      (3L, Array(0.7f, 0.0f, 0.7f))           // b, diverse
    ).toDF("vec_id", "embedding")
    val picks = Mmr.rerankDf(emb, qId = 0L, k = 2, shortlistN = 3,
      lam = 0.5, mu = 0.5).collect().map(_.getLong(1)).toSeq
    assert(picks === Seq(1L, 3L))
  }

  test("CMS: estimate never under-counts, on every user") {
    import spark.implicits._
    val events = Tables.events(spark, sf).select(col("user_id"))
    val sketch = events.as[Long].select(CountMin.sketchAgg.toColumn).head()
    val truth = events.groupBy("user_id").count().collect()
    truth.foreach { r =>
      val (uid, cnt) = (r.getLong(0), r.getLong(1))
      assert(CountMin.estimate(sketch, uid) >= cnt,
        s"under-count for user $uid")
    }
    // each hash row distributes every input exactly once
    val n = events.count()
    (0 until CountMin.Depth).foreach { i =>
      val rowSum = (0 until CountMin.Width)
        .map(w => sketch(i * CountMin.Width + w)).sum
      assert(rowSum === n)
    }
  }

  test("CMS: partition merge equals single-pass sketch (mergeable summary)") {
    import spark.implicits._
    val events = Tables.events(spark, sf).select(col("user_id"))
    val whole = events.as[Long].select(CountMin.sketchAgg.toColumn).head()
    val h1 = events.filter(col("user_id") % 2 === 0)
      .as[Long].select(CountMin.sketchAgg.toColumn).head()
    val h2 = events.filter(col("user_id") % 2 =!= 0)
      .as[Long].select(CountMin.sketchAgg.toColumn).head()
    val merged = CountMin.sketchAgg.merge(h1.clone(), h2)
    assert(merged.toSeq === whole.toSeq)
  }
}
