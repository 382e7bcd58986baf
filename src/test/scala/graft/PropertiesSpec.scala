package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions
import graft.functions.{TextOps, VectorOps}

/** ScalaCheck properties for the vector/text kernels (SURVEY.md §5.3):
  * cosine symmetry/bound/scale-invariance, normalize idempotence, top-k
  * prefix monotonicity, HOF ≡ fused agreement. The scalatest-scalacheck
  * bridge isn't in the offline cache, so generators are sampled with a
  * fixed seed and evaluated in ONE DataFrame per property (cheaper than
  * a Spark job per case anyway).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen: Gen[(List[Float], List[Float], Float)] = for {
    n <- Gen.chooseNum(2, 16)
    a <- Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f))
    b <- Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f))
    lambda <- Gen.chooseNum(0.1f, 50.0f)
  } yield (a, b, lambda)

  test("property: cosine symmetry, |cos| <= 1, positive-scale invariance (100 cases)") {
    val cases = samples(vecGen, 100)
    val df = cases.toDF("a", "b", "lambda")
      .select(
        VectorOps.cosine($"a", $"b").as("ab"),
        VectorOps.cosine($"b", $"a").as("ba"),
        VectorOps.cosine($"a", transform($"b", x => x * $"lambda")).as("ab_scaled"),
        VectorOps.norm($"a").as("na"), VectorOps.norm($"b").as("nb"))
    df.collect().foreach { r =>
      val (ab, ba, abS) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab) <= 1.0 + 1e-9)
      assert(math.abs(ab - ba) < 1e-12)
      if (r.getDouble(3) > 1e-6 && r.getDouble(4) > 1e-6)
        assert(math.abs(abS - ab) < 1e-6)
    }
  }

  test("property: fused expression bit-agrees with HOF kernel (100 cases)") {
    GraftFunctions.register(spark)
    val df = samples(vecGen, 100).map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("hof"),
        GraftFunctions.cosineSim($"a", $"b").as("fused"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dimension mismatch raises in BOTH kernels (HOF and fused), like the reference") {
    GraftFunctions.register(spark)
    val df = Seq((List(1.0f, 2.0f, 3.0f), List(1.0f, 2.0f))).toDF("a", "b")
    val hofErr = intercept[Exception] {
      df.select(VectorOps.cosine($"a", $"b").as("sim")).collect()
    }
    val fusedErr = intercept[Exception] {
      df.select(GraftFunctions.cosineSim($"a", $"b").as("sim")).collect()
    }
    // both surface a dimension-mismatch error naming the two sizes
    Seq(hofErr, fusedErr).foreach { e =>
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("dimension mismatch"), s"unexpected error: $e")
    }
    // and equal dimensions still agree bit-for-bit after the guard
    val ok = Seq((List(1.0f, 2.0f), List(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("hof"),
        GraftFunctions.cosineSim($"a", $"b").as("fused"))
      .head()
    assert(java.lang.Double.doubleToLongBits(ok.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(ok.getDouble(1)))
  }

  test("property: l2Normalize idempotent + unit norm for nonzero vectors (100 cases)") {
    val df = samples(vecGen, 100).map(_._1).filter(_.exists(x => math.abs(x) > 1e-6f))
      .toDF("v")
      .select(VectorOps.norm(VectorOps.l2Normalize($"v")).as("n1"),
        VectorOps.norm(VectorOps.l2Normalize(VectorOps.l2Normalize($"v"))).as("n2"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
    }
  }

  test("property: top-k is a prefix of top-(k+m) under the same total order") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val corpus = emb.filter($"vec_id" =!= 0)
    val top10 = graft.operators.Knn.topK(corpus, q, "vec_id", "embedding", 10, Seq("vec_id"))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    Seq(1, 3, 5, 7).foreach { k =>
      val topk = graft.operators.Knn.topK(corpus, q, "vec_id", "embedding", k, Seq("vec_id"))
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(topk === top10.take(k))
    }
  }

  test("property: tokenization idempotent on its own output (50 cases)") {
    val texts = samples(Gen.listOf(Gen.alphaNumStr), 50).map(_.mkString(" "))
    val df = texts.toDF("t")
      .select(TextOps.tokens($"t").as("t1"),
        TextOps.tokens(concat_ws(" ", TextOps.tokens($"t"))).as("t2"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }
}
