package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Split-conformal prediction intervals (Vovk 2005; Lei et al. 2018) —
  * distribution-free finite-sample uncertainty for ANY point predictor.
  * The training-pipeline face of it: a model's point forecast is rarely
  * enough (SLA sizing, outlier triage, labeling-budget allocation all
  * want "how wrong can this be"), and split conformal turns the OLS fit
  * we already have into calibrated intervals with a marginal coverage
  * GUARANTEE of ≥ 1−α, no distributional assumptions.
  *
  * Recipe, all digest-shaped:
  *  1. hash-pure 3-way split on the row key (train / calibrate / test —
  *     the leakage-safe-split posture);
  *  2. fit OLS on train from ONE moment digest (cov/var/avg);
  *  3. nonconformity scores |y − ŷ| on the calibration half, map-only
  *     with the fitted (a, b) inlined as literals;
  *  4. q̂ = the ⌈(1−α)(n_cal+1)⌉-th smallest score — the finite-sample-
  *     corrected order statistic, NOT an interpolated percentile. Exact
  *     selection takes the α-tail (≈ α·n_cal rows) through a bounded
  *     TakeOrdered heap; at 100 TB the same q̂ comes from the KLL rank
  *     sketch (operators/Kll) within its rank-error bound.
  *  5. dump (a, b, n_cal, k, q̂) — scoring and the coverage report are
  *     then map-only everywhere, and the DuckDB oracle REPLAYS the dumped
  *     doubles instead of re-fitting, so every |y−ŷ| ≤ q̂ comparison is
  *     bit-identical across engines (the dumped-model parity rule).
  */
object Conformal {

  /** Miscoverage level: intervals target ≥ 90% marginal coverage. */
  val Alpha = 0.1

  def modelPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-conformal-m-" + Ann.pathToken(sfDir)

  /** (a, b, n_cal, k, qhat) for the lineitem price-from-quantity task. */
  final case class Model(a: Double, b: Double, nCal: Long, k: Long, qhat: Double)

  private val memo = new ConcurrentHashMap[String, Model]()

  private def half(df: DataFrame, r: Int) = df.filter(col("l_orderkey") % 3 === r)

  /** Fit-and-dump once per JVM per sf dir (the LogReg.model lifecycle). */
  def model(spark: SparkSession, sfDir: String): Model =
    memo.computeIfAbsent(sfDir, { _ =>
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
      // 2: OLS on the train third — one covariance digest, driver-sized
      val f = half(li, 0)
        .agg(covar_samp(col("x"), col("y")).as("cxy"),
          var_samp(col("x")).as("vx"),
          avg(col("x")).as("mx"), avg(col("y")).as("my"))
        .select((col("cxy") / col("vx")).as("b"),
          (col("my") - col("cxy") / col("vx") * col("mx")).as("a"))
        .head()
      val (a, b) = (f.getDouble(1), f.getDouble(0))
      // 3+4: calibration scores with (a, b) as literals; q̂ = k-th order
      // statistic selected from the DESCENDING (n−k+1)-tail so the heap
      // holds ~α·n rows, not (1−α)·n
      val scores = half(li, 1)
        .select(abs(col("y") - (lit(a) + lit(b) * col("x"))).as("score"))
      val nCal = scores.count()
      require(nCal > 0, s"conformal: empty calibration third (sfDir=$sfDir)")
      val k = math.ceil((1.0 - Alpha) * (nCal + 1)).toLong min nCal
      val tail = nCal - k + 1
      // the descending-tail trick needs an Int limit; at a calibration
      // set past 2^31 the KLL sketch path is the right tool — fail loud
      // instead of truncating the cast and silently selecting the wrong
      // order statistic
      require(tail <= Int.MaxValue,
        s"conformal: α-tail $tail exceeds limit() range — use the KLL quantile path")
      val qhat = scores.orderBy(col("score").desc)
        .limit(tail.toInt)
        .agg(min(col("score"))).head().getDouble(0)
      import spark.implicits._
      Seq((a, b, nCal, k, qhat)).toDF("a", "b", "n_cal", "k", "qhat")
        .coalesce(1).write.mode("overwrite").parquet(modelPath(sfDir))
      Model(a, b, nCal, k, qhat)
    })

  /** Per-returnflag coverage report over the held-out test third —
    * the conformal guarantee made visible: marginal coverage ≥ 1−α up to
    * the (observable) finite-sample wobble. Map-only against literals.
    */
  def coverageReport(spark: SparkSession, sfDir: String): DataFrame = {
    val m = model(spark, sfDir)
    half(Tables.lineitem(spark, sfDir), 2)
      .select(col("l_returnflag"),
        (abs(col("l_extendedprice") -
          (lit(m.a) + lit(m.b) * col("l_quantity"))) <= lit(m.qhat))
          .cast("double").as("cov"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_test"),
        round(avg(col("cov")), 6).as("coverage"),
        round(lit(m.qhat), 6).as("qhat"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] def resetMemos(): Unit = memo.clear()
}
