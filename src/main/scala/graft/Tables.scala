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

  /** Session tuning applied at the single load choke point (idempotent).
    *
    * InferFiltersFromGenerate is EXCLUDED: it synthesizes a
    * `size(generator_input) > 0` filter under every explode and pushes it
    * to the scan, re-inlining the generator's whole expression chain into
    * the Filter. Higher-order array functions are interpreted
    * (CodegenFallback) with no common-subexpression reuse, so the inlined
    * chain re-evaluates its children per array element — measured 550x
    * slowdown on minhash_signature (0.7s → 390s at sf0.1). Our generators
    * (embeddings, signatures) are never empty, so the inferred filter
    * only costs.
    */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The fixture tables are single small parquet files → 1 input split →
    * serial execution. CPU-bound per-row kernels (embedding, minhash)
    * need the cores: spread rows across the default parallelism. At real
    * scale the input has thousands of splits and this is a no-op decision
    * — the repartition guards the degenerate single-file case.
    */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    // input-file count, not df.rdd.getNumPartitions: touching .rdd would
    // instantiate the physical plan outside AQE just to read a number
    if (df.inputFiles.length < n) df.repartition(n) else df
  }

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
