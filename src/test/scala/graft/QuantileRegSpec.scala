package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileReg

/** Gates for the IRLS quantile-regression fit (operators/QuantileReg):
  * driver 2×2 algebra, the calibration property that defines a
  * conditional quantile (frac-below ≈ τ), pinball improvement over the
  * OLS warm start, and the τ-ordering of the fitted lines.
  */
class QuantileRegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("solve2 recovers a known weighted least-squares fit") {
    // points (0,1),(1,3),(2,5) with weights 1,2,1 lie EXACTLY on y=1+2x,
    // so the weighted fit must return it regardless of the weights
    val pts = Seq((0.0, 1.0, 1.0), (1.0, 3.0, 2.0), (2.0, 5.0, 1.0))
    val sw = pts.map(_._3).sum
    val swx = pts.map(p => p._3 * p._1).sum
    val swy = pts.map(p => p._3 * p._2).sum
    val swxx = pts.map(p => p._3 * p._1 * p._1).sum
    val swxy = pts.map(p => p._3 * p._1 * p._2).sum
    val (a, b) = QuantileReg.solve2(sw, swx, swy, swxx, swxy)
    assert(math.abs(a - 1.0) < 1e-12 && math.abs(b - 2.0) < 1e-12, s"($a, $b)")
  }

  test("fitted lines are calibrated: frac below the tau-line sits near tau") {
    val rows = SparkEntry.queries("quantile_reg")(spark, sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == QuantileReg.Taus)
    rows.foreach { r =>
      val (tau, fracBelow) = (r.getDouble(0), r.getDouble(5))
      // the IRLS fixed point puts ~tau mass below the line; allow the
      // finite-sample wobble of the 6k-row sf0.001 slice
      assert(math.abs(fracBelow - tau) < 0.05,
        s"tau=$tau frac_below=$fracBelow")
    }
  }

  test("each fit beats the OLS warm start on its own pinball loss") {
    import org.apache.spark.sql.functions._
    val xy = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").as("y"))
    val f0 = xy.agg(covar_samp(col("x"), col("y")), var_samp(col("x")),
      avg(col("x")), avg(col("y"))).head()
    val b0 = f0.getDouble(0) / f0.getDouble(1)
    val a0 = f0.getDouble(3) - b0 * f0.getDouble(2)
    def pinball(tau: Double, a: Double, b: Double): Double =
      xy.select(
        (col("y") - (lit(a) + lit(b) * col("x"))).as("r"))
        .agg(avg(when(col("r") >= 0, lit(tau) * col("r"))
          .otherwise(lit(tau - 1) * col("r")))).head().getDouble(0)
    QuantileReg.model(spark, sf).foreach { fit =>
      val fitted = pinball(fit.tau, fit.a, fit.b)
      val warm = pinball(fit.tau, a0, b0)
      assert(fitted <= warm + 1e-9,
        s"tau=${fit.tau}: fitted pinball $fitted > warm-start $warm")
    }
  }

  test("the 0.9 line sits above the median line over the data range") {
    val fits = QuantileReg.model(spark, sf)
    val med = fits.find(_.tau == 0.5).get
    val hi = fits.find(_.tau == 0.9).get
    // quantile lines may tilt differently, but at the bulk of the data
    // (quantity 1..50) the 0.9 line must dominate the median line
    val crossings = (1 to 50).count(q =>
      hi.a + hi.b * q <= med.a + med.b * q)
    assert(crossings == 0, s"q90 line under median line at $crossings points")
  }
}
