package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions
import graft.functions.VectorOps

class CosineExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fused expression is bit-identical to the HOF kernel over the corpus") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        VectorOps.cosine($"embedding", $"q_emb").as("hof"),
        GraftFunctions.cosineSim($"embedding", $"q_emb").as("fused"))
      .collect()
    assert(both.length === 500)
    both.foreach { r =>
      // bit-identical: same double additions in the same order
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("hof")) ===
        java.lang.Double.doubleToLongBits(r.getAs[Double]("fused")),
        s"mismatch at vec ${r.getLong(0)}")
    }
  }

  test("fused expression: zero-magnitude guard and SQL registration") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    df.createOrReplaceTempView("cos_test")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) AS s FROM cos_test").head().getDouble(0)
    assert(viaSql === 0.0)
  }

  test("fused expression: dimension mismatch throws") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(GraftFunctions.cosineSim($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimension mismatch"))
  }
}
