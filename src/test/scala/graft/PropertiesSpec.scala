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

  test("property: skyline equals the quadratic dominance definition on random point sets (20 sets)") {
    val setGen: Gen[List[(Double, Int)]] = for {
      n <- Gen.chooseNum(1, 60)
      pts <- Gen.listOfN(n, for {
        // small value ranges FORCE duplicate x values, duplicate y values,
        // and exact duplicate points — the tie cases that break naive
        // skyline implementations
        x <- Gen.chooseNum(0, 9)
        y <- Gen.chooseNum(0, 9)
      } yield (x.toDouble, y))
    } yield pts
    samples(setGen, 20).zipWithIndex.foreach { case (pts, i) =>
      val df = pts.zipWithIndex.map { case ((x, y), id) => (id.toLong, x, y) }
        .toDF("id", "x", "y")
      val fast = graft.operators.Skyline.skyline(df, "x", "y", numPartitions = 3)
        .select($"id").collect().map(_.getLong(0)).sorted
      val slow = pts.zipWithIndex.collect {
        case ((x, y), id) if !pts.exists { case (qx, qy) =>
          qx <= x && qy >= y && (qx < x || qy > y) } => id.toLong
      }.sorted
      assert(fast.sameElements(slow),
        s"set $i: fast=${fast.mkString(",")} slow=${slow.mkString(",")} pts=$pts")
    }
  }

  test("property: table fingerprint is order- and partitioning-independent (10 cases)") {
    val rowsGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, Gen.alphaNumStr)
    } yield rows
    samples(rowsGen, 10).foreach { rows =>
      val base = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      def fp(seq: Seq[(Long, String)], parts: Int): (Long, Long) = {
        val r = graft.streaming.Streaming.fingerprintStream(
          seq.toDF("id", "s").repartition(parts),
          concat_ws("|", $"id", $"s")).head()
        (r.getLong(0), r.getLong(1))
      }
      val a = fp(base, 1)
      assert(fp(scala.util.Random.shuffle(base), 4) === a)
      assert(fp(base.reverse, 7) === a)
      // and any single-row change MUST move it
      if (base.nonEmpty) {
        val mutated = base.updated(0, (base.head._1, base.head._2 + "x"))
        assert(fp(mutated, 4) !== a)
      }
    }
  }

  test("property: KMV unsaturated sketches are exact; saturated estimates within 3/sqrt(k) (10 cases)") {
    import graft.functions.Digests
    val k = 64
    val nGen = Gen.oneOf(Gen.chooseNum(1, 40), Gen.chooseNum(500, 3000))
    samples(nGen, 10).foreach { n =>
      val df = (0 until n).map(i => s"v$i").toDF("v")
        .select(Digests.digest60($"v").as("h")).distinct()
      val sk = df.orderBy($"h".asc).limit(k)
        .agg(max($"h").as("hk"), count(lit(1)).as("m")).head()
      val (hk, m) = (sk.getLong(0), sk.getLong(1))
      if (m < k) assert(m === n.toLong, "unsaturated sketch IS the distinct set")
      else {
        val est = (k - 1).toDouble / (hk.toDouble / 1152921504606846976.0)
        assert(math.abs(est - n) / n < 3.0 / math.sqrt(k.toDouble),
          s"n=$n est=$est outside the 3/sqrt(k) bound")
      }
    }
  }
}
