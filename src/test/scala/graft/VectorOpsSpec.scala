package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Double =
    df.head().getDouble(0)

  test("cosine: self-similarity of a nonzero vector is 1") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(math.abs(one(df.select(VectorOps.cosine($"a", $"b"))) - 1.0) < 1e-12)
  }

  test("cosine: zero vector yields 0.0, not NaN (reference guard)") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(one(df.select(VectorOps.cosine($"a", $"b"))) === 0.0)
  }

  test("cosine: symmetry and scale invariance") {
    val df = Seq((Seq(1.0f, -2.0f, 0.5f), Seq(3.0f, 1.0f, -1.0f))).toDF("a", "b")
    val ab = one(df.select(VectorOps.cosine($"a", $"b")))
    val ba = one(df.select(VectorOps.cosine($"b", $"a")))
    assert(math.abs(ab - ba) < 1e-12)
    val scaled = df.select(VectorOps.cosine($"a", transform($"b", x => x * 7.0f)))
    assert(math.abs(one(scaled) - ab) < 1e-9)
    assert(math.abs(ab) <= 1.0 + 1e-12)
  }

  test("cosine: orthogonal vectors score 0") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 5.0f))).toDF("a", "b")
    assert(math.abs(one(df.select(VectorOps.cosine($"a", $"b")))) < 1e-12)
  }

  test("l2Normalize: unit norm after normalization") {
    val df = Seq(Tuple1(Seq(3.0f, 4.0f))).toDF("v")
    val n = one(df.select(VectorOps.norm(VectorOps.l2Normalize($"v"))))
    assert(math.abs(n - 1.0) < 1e-12)
    val first = df.select(VectorOps.l2Normalize($"v")).head().getSeq[Double](0)
    assert(math.abs(first.head - 0.6) < 1e-12 && math.abs(first(1) - 0.8) < 1e-12)
  }

  test("l2Normalize: pass-through when |v| <= 1e-12 (reference semantics)") {
    val df = Seq(Tuple1(Seq(0.0f, 0.0f, 0.0f))).toDF("v")
    val out = df.select(VectorOps.l2Normalize($"v")).head().getSeq[Double](0)
    assert(out === Seq(0.0, 0.0, 0.0))
  }

  test("dot and euclidean agree with hand math") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(one(df.select(VectorOps.dot($"a", $"b"))) === 11.0)
    assert(math.abs(one(df.select(VectorOps.euclidean($"a", $"b"))) - math.sqrt(8.0)) < 1e-12)
  }
}

class KnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("knn_topk returns exactly k rows, sim descending, id tiebreak") {
    val rows = SparkEntry.queries("knn_topk")(spark, sf).collect()
    assert(rows.length === 5)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sortBy(-_)))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("topK caps at corpus size when k > N") {
    val corpus = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("id", "embedding")
    val q = Seq(Tuple1(Seq(1.0f, 1.0f))).toDF("q_emb")
    val out = graft.operators.Knn.topK(corpus, q, "id", "embedding", 10, Seq("id"))
    assert(out.count() === 2)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
