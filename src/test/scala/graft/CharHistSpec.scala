package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{CharHist, GraftFunctions}

/** The fused CharHist kernel must yield the identical (doc, char, n)
  * digest stream as the per-character explode chain it replaces in
  * `charlm_bits` (the explode chain remains the DuckDB oracle
  * formulation).
  */
class CharHistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("fused histogram ≡ explode chain over the fixture corpus") {
    GraftFunctions.register(spark)
    val fused = Tables.documents(spark, sf)
      .select(col("doc_id"), GraftFunctions.charHist(col("text")).as("hist"))
      .select(col("doc_id"), posexplode(col("hist")))
      .filter(col("col") > 0)
      .select(col("doc_id"),
        expr(s"substr('${CharHist.Alphabet}', pos + 1, 1)").as("ch"),
        col("col").as("n"))
    val chain = Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("cs"))
      .filter(length(col("cs")) > 0)
      .selectExpr("doc_id",
        "explode(transform(sequence(1, length(cs)), i -> substr(cs, i, 1))) AS ch")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("n"))
    assert(fused.count() > 0)
    assert(fused.exceptAll(chain).isEmpty && chain.exceptAll(fused).isEmpty)
  }

  test("edge cases: empty, no-alphanumeric, unicode-case input") {
    import spark.implicits._
    val rows = Seq((1L, ""), (2L, "!!! ###"), (3L, "AbC 012 xyz XYZ"))
      .toDF("id", "text")
      .select(col("id"), GraftFunctions.charHist(col("text")).as("h"))
      .collect()
    val h1 = rows.find(_.getLong(0) == 1L).get.getSeq[Long](1)
    val h2 = rows.find(_.getLong(0) == 2L).get.getSeq[Long](1)
    assert(h1.forall(_ == 0L) && h2.forall(_ == 0L) && h1.length == 36)
    val h3 = rows.find(_.getLong(0) == 3L).get.getSeq[Long](1)
    assert(h3(CharHist.Alphabet.indexOf('a')) == 1L)
    assert(h3(CharHist.Alphabet.indexOf('x')) == 2L) // xyz + XYZ lowercased
    assert(h3(CharHist.Alphabet.indexOf('0')) == 1L)
    assert(h3.sum == 12L)
  }

  test("chunk_gen SQL registration rejects a non-literal size with a clear error") {
    GraftFunctions.register(spark)
    spark.range(1).selectExpr("'some text' AS text", "CAST(id AS INT) + 2 AS n")
      .createOrReplaceTempView("cg_err")
    val e = intercept[Exception] {
      spark.sql("SELECT chunk_gen(text, n) FROM cg_err").collect()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected a descriptive error, got: ${e.getMessage}")
  }
}
