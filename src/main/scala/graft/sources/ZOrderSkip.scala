package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Z-ORDER clustered layout + two-column skipping sidecar — the
  * multi-dimensional clustering lever (Delta's OPTIMIZE ZORDER BY): a
  * single-key sort gives perfect file locality on ONE column and none on
  * any other, while interleaving the bits of both range-binned columns
  * gives GOOD locality on each — so per-file min/max stats prune on
  * either predicate column, or both. ScaleLayoutSpec proves the
  * row-group-level version of this claim; this operator is the
  * production face: a persisted layout + sidecar the `zorder_scan` query
  * serves from, built with pure codegen'd Column bit arithmetic (no UDF
  * in the write path).
  *
  * Binning: each column range-normalizes into 8 bits from its (min, max)
  * — driver-sized metadata, same posture as the IVF centers. Skewed
  * domains would swap the linear bin for a quantile bin; the interleave
  * is unchanged.
  */
object ZOrderSkip {

  /** Interleave the low 8 bits of a and b (a gets the odd positions). */
  def interleave8(a: Column, b: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Linear 8-bit range bin of x over [mn, mx]. */
  def bin8(x: Column, mn: Long, mx: Long): Column =
    least(lit(255L), greatest(lit(0L),
      ((x - lit(mn)) * lit(255L)) / lit(math.max(1L, mx - mn))))
      .cast("long")

  private val memos = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per JVM per sf dir) the z-ordered documents layout over
    * (doc_id, n_chars) and a per-file sidecar carrying BOTH columns'
    * min/max — the stats a 2-predicate range query prunes from.
    */
  def layout(spark: SparkSession, sfDir: String, nFiles: Int = 16): String =
    memos.computeIfAbsent(sfDir, { _ =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft-zorder-" + Ann.pathToken(sfDir)
      val docs = Tables.documents(spark, sfDir)
      val b = docs.agg(min(col("doc_id")), max(col("doc_id")),
        min(col("n_chars")), max(col("n_chars"))).head()
      val z = interleave8(
        bin8(col("doc_id"), b.getLong(0), b.getLong(1)),
        bin8(col("n_chars"), b.getLong(2), b.getLong(3)))
      docs.withColumn("__z", z)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(s"$dir/data")
      spark.read.parquet(s"$dir/data")
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          min(col("n_chars")).as("min_ch"), max(col("n_chars")).as("max_ch"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stats")
      dir
    })

  /** 2-D pruned read: files whose per-column spans overlap BOTH ranges
    * are read; the exact predicates re-apply (superset-then-refilter —
    * identical stale-safety posture to SkipIndex/BloomSkip).
    */
  def prunedRead(spark: SparkSession, sfDir: String,
                 idLo: Long, idHi: Long, chLo: Long, chHi: Long): DataFrame = {
    val dir = layout(spark, sfDir)
    val files = spark.read.parquet(s"$dir/stats")
      .filter(col("min_id") <= idHi && col("max_id") >= idLo &&
        col("min_ch") <= chHi && col("max_ch") >= chLo)
      .select(col("file")).collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(s"$dir/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col("doc_id").between(idLo, idHi) &&
      col("n_chars").between(chLo, chHi))
  }

  /** Spec support: files selected by a predicate on each dimension alone. */
  def selectFiles(spark: SparkSession, sfDir: String,
                  idRange: Option[(Long, Long)],
                  chRange: Option[(Long, Long)]): Array[String] = {
    val dir = layout(spark, sfDir)
    var df = spark.read.parquet(s"$dir/stats")
    idRange.foreach { case (lo, hi) =>
      df = df.filter(col("min_id") <= hi && col("max_id") >= lo) }
    chRange.foreach { case (lo, hi) =>
      df = df.filter(col("min_ch") <= hi && col("max_ch") >= lo) }
    df.select(col("file")).collect().map(_.getString(0))
  }

  def dataFiles(spark: SparkSession, sfDir: String): Array[String] = {
    val dir = layout(spark, sfDir)
    spark.read.parquet(s"$dir/data").inputFiles
  }

  private[graft] def resetMemos(): Unit = memos.clear()
}
