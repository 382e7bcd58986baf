package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorAgg

/** The typed Aggregator (UDAF) vector mean: agreement with the
  * posexplode+avg centroid, SQL registration, and the dimension guard.
  */
class VectorAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("aggregator mean matches posexplode centroid to 1e-9") {
    val agg = SparkEntry.queries("vector_mean")(spark, sf).collect()
    val ref = Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col").cast("double")).as("val"))
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("pos")) -> r.getAs[Double]("val"))
      .toMap
    assert(agg.length === ref.size)
    agg.foreach { r =>
      val k = (r.getAs[Int]("label"), r.getAs[Int]("pos"))
      assert(math.abs(r.getAs[Double]("val") - ref(k)) < 1e-6 + math.ulp(ref(k)))
    }
  }

  test("SQL-callable after registration") {
    spark.udf.register("vector_mean", VectorAgg.vectorMean)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_va")
    val n = spark.sql(
      "SELECT label, vector_mean(embedding) AS mv FROM emb_va GROUP BY label")
      .count()
    assert(n === Tables.embeddings(spark, sf).select("label").distinct().count())
  }

  test("mixed dimensions raise") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1f, 2f)), (1L, Seq(1f, 2f, 3f))).toDF("g", "v")
    val e = intercept[SparkException] {
      bad.groupBy(col("g")).agg(VectorAgg.vectorMeanCol(col("v"))).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }
}
