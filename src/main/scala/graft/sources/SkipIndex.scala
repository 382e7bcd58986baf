package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** File-level min/max data skipping — the table-format (Delta/Iceberg/Hudi)
  * planning technique rebuilt on plain parquet: a range-clustered layout
  * plus a per-file (min, max, rows) sidecar lets the planner select the
  * files a range predicate can possibly touch BEFORE any footer is opened.
  *
  * This is a different lever from the two scan-time prunings already
  * evidenced in ScaleLayoutSpec: partition pruning needs the predicate
  * column to BE the directory key, and parquet row-group stats skipping
  * still lists + opens every file's footer. At 100 TB / millions of files,
  * footer-opening is itself a job — the sidecar answers "which files?"
  * from metadata that is KB-sized per thousand files (exactly what a
  * table-format transaction log carries per add-file entry).
  *
  * Correctness posture: the sidecar only ever selects a SUPERSET of the
  * matching files (stats ranges overlapping the predicate range); the
  * exact predicate is re-applied on the rows, so a stale-but-superset
  * sidecar degrades to reading more files, never to wrong answers.
  */
object SkipIndex {

  private val memos = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per JVM per sf dir) the range-clustered documents layout
    * and its stats sidecar. `repartitionByRange` gives disjoint doc_id
    * spans per file — the clustering that makes min/max stats selective;
    * the same sidecar over a random layout would select every file (true,
    * just useless — the skipping win is a LAYOUT property, as the z-order
    * spec shows for the 2-D case). Stats are computed distributed over
    * the written files via the `_metadata.file_path` hidden column; only
    * the per-file digest (3 longs a file) ever reaches the sidecar.
    */
  def layout(spark: SparkSession, sfDir: String, nFiles: Int = 16): String =
    memos.computeIfAbsent(sfDir, { _ =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft-skip-" + Ann.pathToken(sfDir)
      Tables.documents(spark, sfDir)
        .repartitionByRange(nFiles, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dir/data")
      spark.read.parquet(s"$dir/data")
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stats")
      dir
    })

  /** Read the layout through the sidecar: files whose [min, max] span
    * overlaps [lo, hi] are read (an explicit file-list scan — the
    * planner never lists or opens the skipped files), everything else is
    * never touched; the exact range predicate is re-applied on the rows
    * because the file selection is a superset, not the answer.
    */
  def prunedRead(spark: SparkSession, sfDir: String, lo: Long, hi: Long): DataFrame = {
    val dir = layout(spark, sfDir)
    // the sidecar is one digest row per data file — driver-sized by
    // construction (it's the same cardinality a table-format log holds)
    val files = spark.read.parquet(s"$dir/stats")
      .filter(col("min_id") <= hi && col("max_id") >= lo)
      .select(col("file")).collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(s"$dir/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col("doc_id") >= lo && col("doc_id") <= hi)
  }

  /** Total data-file count of the layout (spec support). */
  def dataFiles(spark: SparkSession, sfDir: String): Array[String] = {
    val dir = layout(spark, sfDir)
    spark.read.parquet(s"$dir/data").inputFiles
  }

  private[graft] def resetMemos(): Unit = memos.clear()
}
