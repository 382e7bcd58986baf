package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LogReg

/** Gates for the IRLS logistic-regression quality classifier beyond what
  * the oracled queries (logreg_quality/eval/trace — dumped-model scoring
  * replay) check: the Newton solver's algebra, monotone deviance descent,
  * a real fit improvement over the null model, and that the trained gate
  * actually separates the classes it claims to.
  */
class LogRegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("ridge-damped Gaussian solve recovers a known system") {
    // A = [[4,1,0],[1,3,1],[0,1,2]], x = (1,-2,3) → b = A·x
    val a = Array(Array(4.0, 1.0, 0.0), Array(1.0, 3.0, 1.0), Array(0.0, 1.0, 2.0))
    val x = Array(1.0, -2.0, 3.0)
    val b = a.map(row => row.zip(x).map { case (r, v) => r * v }.sum)
    val got = LogReg.solve(a, b, 0.0)
    x.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-10) }
  }

  test("solve pivots: zero leading diagonal does not divide by zero") {
    val a = Array(Array(0.0, 1.0), Array(1.0, 0.0))
    val got = LogReg.solve(a, Array(2.0, 3.0), 0.0) // swaps rows → x=(3,2)
    assert(math.abs(got(0) - 3.0) < 1e-12 && math.abs(got(1) - 2.0) < 1e-12)
  }

  test("deviance trace: monotone descent from the null start") {
    LogReg.model(spark, sf)
    val devs = spark.read.parquet(LogReg.tracePath(sf))
      .orderBy(col("iter")).collect().map(_.getDouble(1))
    assert(devs.length === LogReg.Iters + 1)
    // iter 0 is w = 0: every p = 0.5, so deviance = 2·N·ln 2 exactly
    val n = Tables.documents(spark, sf).count()
    assert(math.abs(devs.head - 2.0 * n * math.log(2.0)) < 1e-6)
    devs.zip(devs.tail).zipWithIndex.foreach { case ((a, b), i) =>
      assert(b <= a + 1e-6, s"deviance rose at iter ${i + 1}: $a -> $b")
    }
    // and the fit is REAL: a >10% drop vs the null model, not a plateau
    assert(devs.last < 0.9 * devs.head,
      s"fit barely moved: ${devs.head} -> ${devs.last}")
  }

  test("dumped weights: one row per feature, finite, length signal negative") {
    LogReg.model(spark, sf)
    val rows = spark.read.parquet(LogReg.weightsPath(sf))
      .orderBy(col("j")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(rows.map(_._2).toSeq === LogReg.FeatNames)
    assert(rows.forall { case (_, _, w) => java.lang.Double.isFinite(w) })
    // the label is "non-repetitive" and longer word-soup docs repeat more
    // (bounded vocab) — the token-count feature must carry negative
    // weight, or the fit learned noise
    val wTok = rows.find(_._2 == "tok_100").get._3
    assert(wTok < 0.0, s"tok_100 weight $wTok should be negative")
  }

  test("trained gate beats the majority-class baseline on its corpus") {
    val w = LogReg.model(spark, sf).toSeq
    val scored = Tables.documents(spark, sf)
      .select(LogReg.label(col("text")).as("y"),
        when(LogReg.sigmoid(LogReg.linear(col("text"), w)) >= 0.5, 1.0)
          .otherwise(0.0).as("pred"))
      .agg(avg((col("y") === col("pred")).cast("double")).as("acc"),
        avg(col("y")).as("base"))
      .head()
    val (acc, base) = (scored.getDouble(0), scored.getDouble(1))
    val majority = math.max(base, 1.0 - base)
    assert(acc > majority,
      s"accuracy $acc does not beat majority-class $majority")
  }

  test("PAV pools adjacent violators to the weighted mean, leaves isotonic input alone") {
    // already isotonic → unchanged
    assert(LogReg.pav(Seq((1.0, 0.1), (2.0, 0.2), (1.0, 0.9))) ===
      Seq(0.1, 0.2, 0.9))
    // single violation pools to the weighted mean: (1·0.3 + 2·0.15)/3 = 0.2
    val pooled = LogReg.pav(Seq((1.0, 0.1), (1.0, 0.3), (2.0, 0.15), (1.0, 0.5)))
    assert(pooled.length === 4)
    assert(math.abs(pooled(1) - 0.2) < 1e-12 && math.abs(pooled(2) - 0.2) < 1e-12)
    assert(pooled === pooled.sorted, s"not isotonic: $pooled")
    // cascade: a low tail pulls earlier blocks down too
    val cascade = LogReg.pav(Seq((1.0, 0.5), (1.0, 0.4), (1.0, 0.0)))
    assert(cascade.toSet.size === 1 && math.abs(cascade.head - 0.3) < 1e-12)
  }

  test("dumped calibration map: monotone, covers all occupied bins, conserves mass") {
    LogReg.calibration(spark, sf)
    val m = spark.read.parquet(LogReg.calibPath(sf)).orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(m.nonEmpty && m.length <= LogReg.CalBins)
    val cal = m.map(_._4)
    assert(cal.zip(cal.tail).forall { case (a, b) => b >= a - 1e-12 },
      s"calibrated rates not monotone: ${cal.mkString(",")}")
    // PAV preserves the weighted mean (total positive mass)
    val rawMass = m.map { case (_, n, raw, _) => n * raw }.sum
    val calMass = m.map { case (_, n, _, c) => n * c }.sum
    assert(math.abs(rawMass - calMass) < 1e-6,
      s"pooling changed total mass: $rawMass vs $calMass")
    assert(cal.forall(c => c >= -1e-12 && c <= 1 + 1e-12))
  }

  test("fit is partition-layout independent (within float-sum noise)") {
    // same corpus, adversarial partitioning: weights must agree to ~1e-6
    // relative — IRLS digests are plain sums, so only summation order can
    // differ, and the driver solve amplifies nothing at this conditioning
    val (w1, _) = LogReg.fit(spark, sf)
    val tmp = s"${sys.props("java.io.tmpdir")}/graft-logreg-spec-repart"
    Tables.documents(spark, sf).repartition(7, col("lang"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val (w2, _) = LogReg.fit(spark, tmp)
    w1.zip(w2).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)),
        s"weights diverged across layouts: $a vs $b")
    }
  }

  test("cross-validation: full dump, fold models differ, held-out accuracy sane") {
    val rows = spark.read.parquet(LogReg.cvModel(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.length == LogReg.CvFolds * LogReg.Dim)
    val byFold = rows.groupBy(_._1)
      .map { case (k, rs) => k -> rs.sortBy(_._2).map(_._3).toSeq }
    assert(byFold.size == LogReg.CvFolds)
    // different training subsets must produce at least two distinct models
    assert(byFold.values.toSeq.distinct.size > 1,
      "all fold models identical — folds not actually distinct")
    val out = SparkEntry.queries("logreg_cv")(spark, sf).collect()
    assert(out.length == LogReg.CvFolds)
    out.foreach { r =>
      val acc = r.getDouble(4)
      // better than a coin flip on every held-out fold; the full-fit spec
      // pins beats-majority — fold slices at sf0.001 are ~33 docs, so the
      // gate here is deliberately loose
      assert(acc >= 0.5 && acc <= 1.0, s"fold ${r.getInt(0)} accuracy $acc")
    }
  }
}
