package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated Parquet fixtures (see repo:TESTDATA.md,
  * repo:FIXTURES.md). One Parquet file per table under `sfDir`. Schemas are
  * self-describing (Parquet footers); no inferSchema in the engine path.
  *
  * At 100 TB these would be partitioned/bucketed table locations instead of
  * single files — every reader below is a plain `spark.read.parquet`, so the
  * same code works on a directory of thousands of files; Catalyst handles
  * column pruning + predicate pushdown into the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is written as Parquet TIMESTAMP(NANOS), which Spark 4 does
    * not read natively (PARQUET_TYPE_ILLEGAL). Read nanos as raw long via
    * the legacy conf, then truncate to micros with integer division —
    * bit-identical to DuckDB's nanos→micros truncation, and no double
    * round-trip (1.7e18 exceeds double's 53-bit mantissa).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
