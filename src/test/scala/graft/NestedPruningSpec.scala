package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested-schema pruning: selecting one field of a struct column must reach
  * the parquet scan as a pruned nested ReadSchema — the scan reads the one
  * leaf column, not the whole struct. At 100 TB with wide metadata structs
  * (the shape every event/telemetry table converges on), this is the
  * difference between reading a 4-byte column and deserializing the entire
  * nested payload per row.
  */
class NestedPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("struct field selection prunes the nested ReadSchema to one leaf") {
    val dir = Files.createTempDirectory("graft_nested").toString
    // a wide nested payload: meta.{lang, source, n_chars, body} where body
    // is the expensive leaf a pruned scan must NOT read
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        struct(col("lang"), col("source"), col("n_chars"),
          col("text").as("body")).as("meta"))
      .write.mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir).select(col("doc_id"), col("meta.lang"))
    val scan = df.queryExecution.executedPlan.toString
    // ReadSchema must show meta pruned to the single lang leaf
    assert(scan.matches("(?s).*ReadSchema:[^\\n]*meta:struct<lang:string>.*"),
      s"nested schema not pruned:\n${scan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")}")
    assert(!scan.matches("(?s).*ReadSchema:[^\\n]*body.*"),
      "pruned scan still reads the body leaf")
    // and the pruned read is still correct
    val got = df.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    val want = Tables.documents(spark, sf).select("doc_id", "lang")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("aggregation over one nested field keeps the pruned scan") {
    val dir = Files.createTempDirectory("graft_nested2").toString
    Tables.events(spark, sf)
      .select(col("event_id"),
        struct(col("event_type"), col("value"), col("props")).as("payload"))
      .write.mode("overwrite").parquet(dir)
    val agg = spark.read.parquet(dir)
      .groupBy(col("payload.event_type"))
      .agg(round(sum(col("payload.value")), 2).as("total"))
    val scan = agg.queryExecution.executedPlan.toString
    assert(!scan.matches("(?s).*ReadSchema:[^\\n]*props.*"),
      "aggregate over two leaves still reads the props leaf")
    val got = agg.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("total"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq)
  }
}
