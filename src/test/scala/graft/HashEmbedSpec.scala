package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextOps, VectorOps}

/** The fused native HashEmbed kernel must be bit-identical to the staged
  * HOF chain it replaces in hot paths (the HOF chain remains the DuckDB
  * oracle formulation).
  */
class HashEmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("fused ≡ HOF chain bit-for-bit over the fixture corpus (passage-prefixed)") {
    val both = Tables.documents(spark, sf)
      .withColumn("raw", TextOps.hashEmbedRaw(TextOps.passageText(col("text"))))
      .select(col("doc_id"),
        VectorOps.l2Normalize(col("raw")).as("hof"),
        TextOps.hashEmbedFused(TextOps.passageText(col("text"))).as("fused"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val hof = r.getSeq[Double](r.fieldIndex("hof"))
      val fused = r.getSeq[Double](r.fieldIndex("fused"))
      assert(hof.length === fused.length)
      hof.zip(fused).zipWithIndex.foreach { case ((a, b), i) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b),
          s"doc ${r.getAs[Long]("doc_id")} bucket $i: $a vs $b")
      }
    }
  }

  test("edge cases: tokenless input gives the zero vector, truncation at 512 tokens") {
    import spark.implicits._
    val cases = Seq(
      (1L, ""), (2L, "!!! ### ---"),
      (3L, (1 to 600).map(i => s"tok$i").mkString(" ")),
      (4L, "MiXeD Case TOKENS 123"))
      .toDF("id", "text")
    val rows = cases.select(col("id"),
      TextOps.hashEmbedFused(col("text")).as("fused"),
      VectorOps.l2Normalize(TextOps.hashEmbedRaw(col("text"))).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2),
        s"id ${r.getLong(0)}")
    }
    val zero = rows.find(_.getLong(0) == 2L).get.getSeq[Double](1)
    assert(zero.forall(_ == 0.0))
  }

  test("SQL-callable and codegen-compatible") {
    graft.expressions.GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_he")
    val df = spark.sql(
      "SELECT doc_id, hash_embed(text) AS e FROM docs_he ORDER BY doc_id LIMIT 5")
    // the hash_embed projection runs inside a whole-stage-codegen span
    // (the `*(n)` prefix in the compact plan string)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("hashembed"),
      s"not codegen'd:\n$plan")
    val norms = df.collect().map(r =>
      math.sqrt(r.getSeq[Double](1).map(x => x * x).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9 || n == 0.0))
  }
}
