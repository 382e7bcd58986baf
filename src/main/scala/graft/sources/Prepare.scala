package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextOps, VectorOps}

/** The reference's Prepare ETL (DotNetVectorSearch.Prepare/Program.cs:16-70)
  * as one distributed pipeline: CSV scan → quote-aware record parse →
  * combined_text projection → "passage: " prefix → embed → columnar sink.
  *
  * The reference parses CSV with a hand-rolled quote toggler
  * (Program.cs:135-160) and silently drops rows with fewer than 3 fields
  * (Program.cs:46); Spark's CSV datasource subsumes the quote handling
  * (and fixes the `""` escape and embedded-newline cases the reference
  * gets wrong), and the explicit non-null filter reproduces the row-drop.
  * The per-row INSERT loop (Program.cs:114-133) becomes a single
  * `write.parquet` — the delete-and-recreate teardown (Program.cs:83-87)
  * is `mode("overwrite")`.
  */
object Prepare {

  val csvSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("question", StringType),
    StructField("answer", StringType)))

  /** CSV → documents DataFrame with combined text, embedding, dimensions,
    * created_at — the reference's `documents` table schema, columnar.
    */
  def fromCsv(spark: SparkSession, csvPath: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"") // CSV standard "" escaping (ref gets this wrong)
      .schema(csvSchema)
      .csv(csvPath)
    raw
      .filter(col("id").isNotNull && col("question").isNotNull &&
        col("answer").isNotNull) // ref drops short rows, Program.cs:46
      .withColumn("combined_text",
        concat(col("question"), lit(" : "), col("answer"))) // Program.cs:55
      .withColumn("embedding",
        TextOps.hashEmbedFused(TextOps.passageText(col("combined_text"))))
      .withColumn("embedding_dimensions", size(col("embedding")))
      .withColumn("created_at", current_timestamp())
  }

  /** Columnar sink (the reference's SQLite INSERT loop → one parquet
    * write; overwrite ≡ drop-and-recreate).
    */
  def sink(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Hive-partitioned sink: the layout a training pipeline ships —
    * `path/col=value/part-*.parquet`. Downstream readers of one partition
    * (the training job reading `split=train`, an eval job reading
    * `split=test`) get partition pruning for free: the filter becomes a
    * directory selection, no data files of other partitions are opened.
    * At 100 TB the partition columns must be low-cardinality (split, date,
    * lang) — high-cardinality partitioning degenerates to a file per value.
    */
  def partitionedSink(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
