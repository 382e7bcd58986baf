package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions

/** The native WinnowHash kernel must equal an independent SQL-HOF
  * recomputation (the same formulation as the DuckDB oracle in
  * `winnow_dedup`), and the fingerprints must behave like winnowing
  * fingerprints: identical docs share everything, disjoint docs share
  * nothing, and a shared passage of ≥ k+w-1 chars guarantees a shared
  * fingerprint (the winnowing coverage theorem).
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("native kernel ≡ SQL window-min formulation over the fixture corpus") {
    GraftFunctions.register(spark)
    val native = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), explode(GraftFunctions.winnowHash(col("text"))).as("fp"))
    // the oracle formulation: k-gram hashes as rows, window min, distinct
    val chain = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("cs"))
      .filter(length(col("cs")) >= 8 + 4 - 1)
      .selectExpr("doc_id", "length(cs) - 7 AS g",
        """explode(transform(sequence(1, length(cs) - 7),
          |  i -> named_struct('i', i, 'h',
          |    aggregate(sequence(i, i + 7), 0L,
          |      (acc, j) -> (acc * 31 + ascii(substr(cs, j, 1))) % 1000000007L)))) AS kv
          |""".stripMargin)
      .select(col("doc_id"), col("g"), col("kv.i").as("i"), col("kv.h").as("h"))
      .withColumn("fp", min(col("h")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("i")).rowsBetween(0, 3)))
      .filter(col("i") <= col("g") - 3)
      .select(col("doc_id"), col("fp")).distinct()
    assert(native.count() > 0)
    assert(native.exceptAll(chain).isEmpty && chain.exceptAll(native).isEmpty)
  }

  test("fingerprint-set behavior: identity, disjointness, shared passage") {
    import spark.implicits._
    val passage = "this exact shared passage is certainly long enough to fingerprint"
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
      (3L, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec"),
      (4L, s"totally different preamble here. $passage and an unrelated tail."),
      (5L, s"$passage with its own continuation text afterwards.")
    ).toDF("id", "text")
      .select(col("id"), GraftFunctions.winnowHash(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(docs(1L) == docs(2L) && docs(1L).nonEmpty)
    assert(docs(1L).intersect(docs(3L)).isEmpty)
    // winnowing guarantee: a shared substring of length ≥ k+w-1 (= 11)
    // always yields at least one common fingerprint
    assert(docs(4L).intersect(docs(5L)).nonEmpty)
  }

  test("edge cases: short and non-alphanumeric inputs yield empty sets") {
    import spark.implicits._
    val rows = Seq((1L, ""), (2L, "!!!"), (3L, "abcdefghij"), (4L, "abcdefghijk"))
      .toDF("id", "text")
      .select(col("id"), GraftFunctions.winnowHash(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    // 10 chars → 3 k-grams < w windows → empty; 11 chars → exactly 1 window
    assert(rows(3L).isEmpty)
    assert(rows(4L).length == 1)
    // sorted ascending, distinct
    val fp = Tables.documents(spark, sf).limit(5)
      .select(GraftFunctions.winnowHash(col("text")).as("fps"))
      .collect().map(_.getSeq[Long](0))
    fp.foreach(s => assert(s == s.distinct.sorted))
  }
}
