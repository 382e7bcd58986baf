package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed QUANTILE regression (Koenker & Bassett 1978) by IRLS — the
  * conditional-quantile twin of the engine's mean models (`ols_slope`,
  * `Conformal`'s OLS point model): fit y = a + b·x minimizing the pinball
  * loss ρ_τ(r) = r·(τ − 1{r<0}) at τ ∈ {0.5, 0.9}. Median regression is
  * the robust-to-outliers line every data-quality pipeline wants when a
  * metric is heavy-tailed; the τ=0.9 line is the heteroscedasticity probe
  * (does price SPREAD grow with quantity, not just its mean?).
  *
  * Solver: iteratively reweighted least squares on MOMENT DIGESTS — the
  * `LogReg` posture. Each iteration ships (a, b) in as literals, folds the
  * corpus to ONE map-side-combined 5-double digest (Σw, Σwx, Σwy, Σwx²,
  * Σwxy) with w_i = |τ − 1{r_i<0}| / max(|r_i|, δ) (the exact IRLS
  * majorizer of the pinball loss), and the DRIVER solves the 2×2 weighted
  * normal equations. T iterations = T corpus passes moving 5 doubles per
  * partition each; driver state is two doubles. Init = the OLS fit from
  * one covariance digest.
  *
  * The fitted (tau, a, b) rows are DUMPED to parquet — the trained-state
  * replay contract (`Ann`/`Pca`/`LogReg`): the oracle re-scores from the
  * dump and never re-fits, so cross-engine training determinism is not
  * load-bearing. Serving (scoring, pinball audit, calibration check) is
  * map-only against the 2-row broadcast model.
  *
  * Reference anchor: the reference has no model fitting at all — its only
  * numeric kernel is the cosine scan (VectorSearchService.cs:219-242);
  * this is the trained-analytics layer a 100 TB engine adds.
  */
object QuantileReg {

  val Taus: Seq[Double] = Seq(0.5, 0.9)
  /** IRLS on the pinball loss converges LINEARLY and slowly at extreme
    * τ — measured: τ=0.9 needs ~40 rounds for frac-below to reach 0.894
    * (10 rounds stalls at 0.758); τ=0.5 is done by ~10. 40 fused digest
    * passes over the checkpointed 2-column frame cost ~0.1 s each.
    */
  val Iters = 40
  /** Residual floor in the IRLS weight — keeps w finite at r ≈ 0. */
  val Delta = 1e-8

  final case class Fit(tau: Double, a: Double, b: Double)

  private val memo = new ConcurrentHashMap[String, Seq[Fit]]()

  /** Drop the JVM memo so Bench's second stage pass times a cold build. */
  private[graft] def resetMemos(): Unit = memo.clear()

  def modelPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-qreg-" + Ann.pathToken(sfDir)

  /** Solve the 2×2 weighted normal equations from the 5-moment digest. */
  private[graft] def solve2(sw: Double, swx: Double, swy: Double,
      swxx: Double, swxy: Double): (Double, Double) = {
    val det = sw * swxx - swx * swx
    // mirror LogReg.solve's singular-system guard: a degenerate weighted
    // design (all IRLS weight on one x value) must fail loud, not dump
    // NaN/Infinity coefficients for the oracle to replay
    require(det.isFinite && det != 0.0,
      s"quantile-reg: singular weighted design (det=$det, sw=$sw)")
    val b = (sw * swxy - swx * swy) / det
    val a = (swy - b * swx) / sw
    require(a.isFinite && b.isFinite,
      s"quantile-reg: non-finite fit (a=$a, b=$b)")
    (a, b)
  }

  /** Fit-and-dump once per JVM per sf dir; returns the fits in Taus order. */
  def model(spark: SparkSession, sfDir: String): Seq[Fit] =
    memo.computeIfAbsent(sfDir, { _ =>
      // The IRLS loop below scans this 2-double frame Iters times: pin it
      // ONCE as a primitive-array RDD (DigestPass.cachedDoubles — at
      // 100 TB the same persist at MEMORY_AND_DISK, MLlib's
      // GradientDescent posture). Kept at the source partitioning
      // deliberately: each digest is a single no-exchange stage, and 40
      // of those beat 40 two-stage jobs — a repartition(32) first was
      // MEASURED SLOWER (29 s vs 14 s cold) from per-iteration
      // scheduling overhead at this row count.
      val xy = Tables.lineitem(spark, sfDir)
        .select(col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").as("y"))
      val rows = DigestPass.cachedDoubles(xy)
      // OLS warm start — one covariance digest (the Conformal fit shape):
      // the same single-stage fold as the loop, off the cached primitives
      // (n, Σx, Σy, Σxx, Σxy → covar_samp/var_samp/avg identities)
      val m0 = DigestPass.fold(rows, 5) { (acc, a) =>
        acc(0) += 1.0; acc(1) += a(0); acc(2) += a(1)
        acc(3) += a(0) * a(0); acc(4) += a(0) * a(1)
      }
      val (n0, sx, sy, sxx, sxy) = (m0(0), m0(1), m0(2), m0(3), m0(4))
      val b0 = (sxy - sx * sy / n0) / (sxx - sx * sx / n0)
      val a0 = sy / n0 - b0 * (sx / n0)
      // both τ fits iterate in LOCKSTEP: one fused digest pass per round
      // carries every tau's 5 weighted moments (10 doubles per partition).
      // Round-14 optimization: the digest is a DigestPass.fold — ONE
      // map-only stage per iteration whose partials come straight to the
      // driver, replacing the two-stage SQL aggregation that cost an
      // exchange + an AQE re-plan per iteration (measured 7.7 s → ~2 s
      // cold for the 40-round loop; per-row arithmetic identical to the
      // previous expression tree, partials merged in partition-index
      // order — more deterministic than the shuffle-fetch-order merge
      // it replaces).
      val coef = Array.fill(Taus.length)((a0, b0))
      val taus = Taus.toArray
      var t = 0
      while (t < Iters) {
        val cs = coef.clone()
        val d = DigestPass.fold(rows, 5 * taus.length) { (acc, row) =>
          val x = row(0)
          val y = row(1)
          var i = 0
          while (i < taus.length) {
            val r = y - (cs(i)._1 + cs(i)._2 * x)
            val w = math.abs(taus(i) - (if (r < 0) 1.0 else 0.0)) /
              math.max(math.abs(r), Delta)
            acc(5 * i) += w
            acc(5 * i + 1) += w * x
            acc(5 * i + 2) += w * y
            acc(5 * i + 3) += w * x * x
            acc(5 * i + 4) += w * x * y
            i += 1
          }
        }
        Taus.indices.foreach { i =>
          coef(i) = solve2(d(5 * i), d(5 * i + 1), d(5 * i + 2),
            d(5 * i + 3), d(5 * i + 4))
        }
        t += 1
      }
      val fits = Taus.zipWithIndex.map { case (tau, i) =>
        Fit(tau, coef(i)._1, coef(i)._2)
      }
      rows.unpersist()
      import spark.implicits._
      fits.toDF("tau", "a", "b")
        .coalesce(1).write.mode("overwrite").parquet(modelPath(sfDir))
      fits
    })
}
