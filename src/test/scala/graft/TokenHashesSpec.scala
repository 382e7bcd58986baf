package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextOps

class TokenHashesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native expression equals HOF chain on the whole fixture corpus") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = d.select(col("doc_id"),
      TextOps.tokenHashes(col("text")).as("fast"),
      TextOps.tokenHashesHof(col("text")).as("hof")).collect()
    assert(both.length === 500)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("native expression edge cases match HOF") {
    val cases = Seq(
      "", "   ", "!!!", "one", "ONE Two tHree", "a-b_c.d,e",
      "trailing sep!", "!leading", "num8er5 m1xed", "éàü unicode ÉDGE",
      "passage: prefixed text", (1 to 600).map(i => s"tok$i").mkString(" "))
    val df = cases.toDF("t")
      .select(TextOps.tokenHashes($"t").as("fast"),
        TextOps.tokenHashesHof($"t").as("hof"))
    df.collect().zip(cases).foreach { case (r, c) =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"input <$c>")
    }
  }
}
