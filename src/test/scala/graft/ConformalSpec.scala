package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Conformal

/** Split-conformal guarantees are exact finite-sample statements, so they
  * are testable as hard assertions, not statistical hopes: q̂ IS the
  * ⌈(1−α)(n+1)⌉-th order statistic of the calibration scores, at least k
  * calibration scores sit inside the interval by construction, and the
  * held-out coverage lands near 1−α (wobble bounded by the test-third
  * size). The dumped model must replay exactly (the oracle consumes it).
  */
class ConformalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("qhat is exactly the k-th smallest calibration score") {
    val m = Conformal.model(spark, sf)
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 1)
      .select(abs(col("l_extendedprice") -
        (lit(m.a) + lit(m.b) * col("l_quantity"))).as("score"))
    // recompute from the OTHER direction: ascending limit(k) → max
    val direct = li.orderBy(col("score").asc).limit(m.k.toInt)
      .agg(max(col("score"))).head().getDouble(0)
    assert(m.qhat === direct)
    assert(m.k === math.ceil(0.9 * (m.nCal + 1)).toLong.min(m.nCal))
  }

  test("at least k calibration scores fall inside the interval (by construction)") {
    val m = Conformal.model(spark, sf)
    val inside = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 3 === 1)
      .filter(abs(col("l_extendedprice") -
        (lit(m.a) + lit(m.b) * col("l_quantity"))) <= lit(m.qhat))
      .count()
    assert(inside >= m.k)
  }

  test("held-out marginal coverage is near 1 - alpha") {
    val rows = Conformal.coverageReport(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_test")).sum
    val covered = rows.map(r => r.getAs[Double]("coverage") * r.getAs[Long]("n_test")).sum
    val marginal = covered / n
    // n_test ≈ 200 at sf0.001 → binomial sd ≈ 2.1%; 4 sd of slack
    assert(marginal > 0.81 && marginal <= 1.0, s"marginal coverage $marginal")
    assert(rows.forall(_.getAs[Double]("qhat") > 0.0))
  }

  test("dumped model replays the in-memory fit exactly") {
    val m = Conformal.model(spark, sf)
    val r = spark.read.parquet(Conformal.modelPath(sf)).head()
    assert(r.getAs[Double]("a") === m.a)
    assert(r.getAs[Double]("b") === m.b)
    assert(r.getAs[Long]("n_cal") === m.nCal)
    assert(r.getAs[Double]("qhat") === m.qhat)
  }
}
