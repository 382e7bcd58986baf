package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps

/** Native NFC normalization: canonical composition must match
  * java.text.Normalizer, ride whole-stage codegen, and pass through
  * already-normalized strings untouched.
  */
class NfcNormalizeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark

  test("composes decomposed sequences; identity on NFC input") {
    import spark.implicits._
    val rows = Seq(
      "é",          // e + combining acute -> U+00E9
      "Å",           // Angstrom sign -> U+00C5
      "Å",          // A + combining ring -> U+00C5
      "é already",   // composed stays
      "plain ascii",
      "")
    val got = rows.toDF("s")
      .select(TextOps.nfcNormalize(col("s")).as("n"))
      .as[String].collect().toSeq
    val want = rows.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got === want)
    assert(got.head === "é" && got.head.length === 1)
  }

  test("null-safe and SQL-registered via extensions") {
    import spark.implicits._
    val d = Seq(Some("Å"), None).toDF("s")
    assert(d.select(TextOps.nfcNormalize(col("s"))).collect().map(_.isNullAt(0)).toSeq
      === Seq(false, true))
    val viaSql = spark.sql("SELECT nfc_normalize('é') AS n").head().getString(0)
    assert(viaSql === "é")
  }

  test("participates in whole-stage codegen") {
    // non-foldable input over a codegen source (a literal would be
    // constant-folded away and prove nothing)
    val df = spark.range(3).select(
      TextOps.nfcNormalize(concat(lit("e\u0301"), col("id").cast("string"))).as("n"))
    val stages = collect(df.queryExecution.executedPlan) {
      case w: WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, "nfc_normalize fell out of whole-stage codegen")
    assert(df.orderBy("n").head().getString(0) === "\u00e90")
  }
}
