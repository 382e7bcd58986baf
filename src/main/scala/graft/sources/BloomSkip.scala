package graft.sources

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Per-file BLOOM-FILTER data skipping — the point-lookup complement of the
  * min/max sidecar (`SkipIndex`). Min/max skipping only works when the
  * predicate column is the CLUSTERING column; the moment a lookup arrives by
  * a key the layout is not sorted on (fetch-document-by-id against a corpus
  * clustered by language/length for analytics), every file's [min, max] id
  * span overlaps every probe and the range sidecar selects ALL files. A
  * per-file Bloom filter over the scattered key answers "which files can
  * possibly hold id X?" from KB-sized metadata — the same lever as Delta's
  * bloom-filter index / Parquet's optional bloom pages, rebuilt from scratch.
  *
  * The filter is built DISTRIBUTED in one pass: a mergeable typed
  * `Aggregator` ORs per-partition bitsets per file (`_metadata.file_path`
  * grouping), so construction is a map-side-combined aggregate over the
  * written layout — no driver loop, no second scan per file. Bit positions
  * come from double hashing h1 + i·h2 over splitmix64 mixes (Vigna,
  * public-domain finalizer; Kirsch–Mitzenmacher 2006 for the double-hash
  * scheme), so the bitset is a pure commutative OR-fold of the key set —
  * deterministic under any partitioning or merge order.
  *
  * Correctness posture (same as SkipIndex): no false NEGATIVES by
  * construction, so the selected file list is always a superset of the
  * files holding matches; the exact predicate re-applies on the rows, so a
  * false positive costs one extra file read, never a wrong answer.
  *
  * 100 TB shape: at 10 bits/key the sidecar is ~1.2 bytes per row per
  * indexed column — per THOUSAND files it is MBs, exactly what a
  * table-format transaction log carries as per-file auxiliary metadata. The
  * probe below filters the sidecar DataFrame and collects only the
  * surviving file NAMES (bounded by the hit count + false positives), so
  * the planning step stays metadata-sized even at millions of files.
  */
object BloomSkip {

  /** splitmix64 finalizer (Vigna, public domain) — the bit mixer under both
    * double-hash streams.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** m must be a power of two (bit index by mask, not modulo). */
  val DefaultBits = 1 << 12 // 512 bytes/file — ~10 bits/key at ~400 rows/file
  val DefaultHashes = 5

  private def bitPositions(key: Long, mBits: Int, k: Int): Array[Int] = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5DEECE66DL) | 1L // odd → full-period stride
    val out = new Array[Int](k)
    var i = 0
    while (i < k) {
      out(i) = (((h1 + i * h2) >>> 1) & (mBits - 1)).toInt
      i += 1
    }
    out
  }

  /** Mergeable per-group Bloom builder: BUF/OUT are the raw bitset words.
    * reduce sets k bits per key; merge is the word-wise OR — commutative
    * and associative, so the finished bitset is independent of partitioning
    * and merge order (spec-pinned).
    */
  class BloomAgg(mBits: Int, k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](mBits / 64)
    def reduce(b: Array[Long], key: Long): Array[Long] = {
      val pos = bitPositions(key, mBits, k)
      var i = 0
      while (i < k) { b(pos(i) >>> 6) |= 1L << (pos(i) & 63); i += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def mightContain(bits: Array[Long], key: Long, k: Int): Boolean = {
    val mBits = bits.length * 64
    val pos = bitPositions(key, mBits, k)
    var i = 0
    while (i < k) {
      if ((bits(pos(i) >>> 6) & (1L << (pos(i) & 63))) == 0L) return false
      i += 1
    }
    true
  }

  private val memos = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build (once per JVM per sf dir) the analytics-clustered layout — range
    * partitioned by (lang, n_chars), the natural sort for per-language
    * length-bucketed scans — and its per-file bloom sidecar over the NOW
    * SCATTERED doc_id. min/max of doc_id ride along so the spec can show
    * the range sidecar is useless on this key (every file spans ~the whole
    * id domain) while the bloom prunes.
    */
  def layout(spark: SparkSession, sfDir: String, nFiles: Int = 16): String =
    memos.computeIfAbsent(sfDir, { _ =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft-bloomskip-" + Ann.pathToken(sfDir)
      Tables.documents(spark, sfDir)
        .repartitionByRange(nFiles, col("lang"), col("n_chars"), col("doc_id"))
        .sortWithinPartitions("lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/data")
      spark.read.parquet(s"$dir/data")
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(
          udaf(new BloomAgg(DefaultBits, DefaultHashes)).apply(col("doc_id")).as("bloom"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/stats")
      dir
    })

  /** Planning step: files whose bloom might contain ANY probe id. Runs as a
    * filter over the sidecar (distributed at scale); only surviving file
    * names are collected — output cardinality ≈ matching files + false
    * positives, never the file count.
    */
  def selectFiles(spark: SparkSession, sfDir: String, ids: Seq[Long]): Array[String] = {
    val dir = layout(spark, sfDir)
    val probe = ids.toArray
    val k = DefaultHashes
    val anyHit = udf((bits: Array[Long]) => probe.exists(mightContain(bits, _, k)))
    spark.read.parquet(s"$dir/stats")
      .filter(anyHit(col("bloom")))
      .select(col("file")).collect().map(_.getString(0))
  }

  /** Point lookup through the sidecar: read only bloom-selected files,
    * re-apply the exact IN predicate (superset semantics).
    */
  def lookup(spark: SparkSession, sfDir: String, ids: Seq[Long]): DataFrame = {
    val dir = layout(spark, sfDir)
    val files = selectFiles(spark, sfDir, ids)
    val base =
      if (files.isEmpty) spark.read.parquet(s"$dir/data").limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    base.filter(col("doc_id").isInCollection(ids))
  }

  def dataFiles(spark: SparkSession, sfDir: String): Array[String] = {
    val dir = layout(spark, sfDir)
    spark.read.parquet(s"$dir/data").inputFiles
  }

  /** Range sidecar view of the same layout (spec support: shows min/max is
    * the WRONG tool for a scattered key).
    */
  def stats(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = layout(spark, sfDir)
    spark.read.parquet(s"$dir/stats")
  }

  private[graft] def resetMemos(): Unit = memos.clear()
}
