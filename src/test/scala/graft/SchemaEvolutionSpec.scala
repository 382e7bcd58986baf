package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on an append-maintained parquet layout — the months-
  * of-ingest reality at 100 TB: batches written before a column existed
  * must stay readable beside batches written after, without rewriting a
  * single old file. Spark's answer is footer-merged reads
  * (`mergeSchema`): the union schema is computed from file footers at
  * planning time, old files surface NULL for late columns, and column
  * pruning still reaches the scan. Incompatible evolution (same column,
  * conflicting types) must fail loudly at plan time — silent coercion is
  * how a corpus corrupts.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("late-added column: merged read unions footers, old rows surface NULL, pruning intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schevo").toFile.getAbsolutePath
    // era 1: (id, a) — the column `quality` does not exist yet
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    // era 2: the pipeline grew a quality score; old files untouched
    Seq((3L, "z", 0.9), (4L, "w", 0.2)).toDF("id", "a", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.sorted.toSeq === Seq("a", "id", "quality"))
    val rows = merged.select(col("id"), col("quality"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(rows === Map(1L -> None, 2L -> None,
      3L -> Some(0.9), 4L -> Some(0.2)))
    // era-aware predicate: NULL-safe filters see exactly the new era
    assert(merged.filter(col("quality").isNotNull).count() === 2)
    // column pruning still reaches the scan through the merged schema
    val plan = merged.select(col("id")).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"merged read lost pruning:\n$plan")
  }

  test("conflicting types for one column fail loudly at read planning, not silently coerce") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schevo2").toFile.getAbsolutePath
    Seq((1L, 10)).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((2L, "not a number")).toDF("id", "v").write.mode("append").parquet(dir)
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    val msg = e.toString + Option(e.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("merg") || msg.toLowerCase.contains("schema"),
      s"unexpected failure mode: $e")
  }
}
