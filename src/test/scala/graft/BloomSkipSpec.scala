package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BloomSkip

/** Bloom-filter file skipping: the point-lookup pruning lever on a layout
  * whose clustering key is NOT the lookup key. The range sidecar must be
  * provably useless here (that's the motivation), the bloom must prune, and
  * the whole path must be a superset-then-refilter (no false negatives).
  */
class BloomSkipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("sidecar is one digest row per data file") {
    // inputFiles and _metadata.file_path render the same local path with
    // different file:-URI slash counts — compare paths, not URI spellings
    def path(u: String) = new java.net.URI(u).getPath
    val files = BloomSkip.dataFiles(spark, sf).map(path)
    val stats = BloomSkip.stats(spark, sf).collect()
    assert(stats.length === files.length)
    assert(stats.map(r => path(r.getAs[String]("file"))).toSet === files.toSet)
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 500L)
  }

  test("min/max is useless on the scattered key: every file's id span covers the probe") {
    // The layout clusters by (lang, n_chars); doc_id is scattered, so a
    // range sidecar on doc_id selects every file for any mid-domain probe —
    // the situation the bloom sidecar exists for.
    val stats = BloomSkip.stats(spark, sf).collect()
    val probe = 233L
    val overlapping = stats.count(r =>
      r.getAs[Long]("min_id") <= probe && r.getAs[Long]("max_id") >= probe)
    assert(overlapping === stats.length,
      s"expected the range stats to select ALL ${stats.length} files, got $overlapping — " +
        "the fixture no longer scatters doc_id and this spec's premise broke")
  }

  test("bloom selects a strict subset of files for present ids") {
    val total = BloomSkip.dataFiles(spark, sf).length
    val selected = BloomSkip.selectFiles(spark, sf, Seq(7L, 233L, 411L))
    assert(selected.nonEmpty)
    // 3 probes can land in ≤3 distinct files; allow a small false-positive
    // margin but demand real pruning (at 16 files, reading >half defeats
    // the index).
    assert(selected.length <= 6,
      s"bloom selected ${selected.length} of $total files for 3 probes")
    assert(selected.length < total)
  }

  test("lookup ≡ plain filter (superset-then-refilter, no false negatives)") {
    val ids = Seq(7L, 233L, 411L)
    val got = BloomSkip.lookup(spark, sf, ids)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq)
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id").isInCollection(ids))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    assert(got.length === 3)
  }

  test("no false negatives across the whole corpus") {
    // Every present id must select at least the file that holds it: probe
    // all 500 ids against the sidecar and join to ground truth.
    val stats = BloomSkip.stats(spark, sf).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[scala.collection.Seq[Long]]("bloom").toArray))
    val truth = spark.read.parquet(BloomSkip.layout(spark, sf) + "/data")
      .select(col("doc_id"), col("_metadata.file_path").as("file"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    truth.foreach { case (id, file) =>
      val bits = stats.find(_._1 == file).get._2
      assert(BloomSkip.mightContain(bits, id, BloomSkip.DefaultHashes),
        s"false negative: id $id not found in its own file's bloom")
    }
  }

  test("absent key: few files touched, empty result") {
    val selected = BloomSkip.selectFiles(spark, sf, Seq(987654321L))
    // False-positive rate at ~10 bits/key, k=5 is <1%; across 16 files the
    // expected touch count is ≈0. Allow 2 before calling it broken.
    assert(selected.length <= 2,
      s"absent probe selected ${selected.length} files — fpp far above design")
    assert(BloomSkip.lookup(spark, sf, Seq(987654321L)).count() === 0L)
  }

  test("bitset is partitioning-independent (commutative OR-fold)") {
    import spark.implicits._
    val keys = (0L until 400L).map(k => k * 977L % 10007L)
    def bitsOf(nPart: Int): Array[Long] = {
      val df = keys.toDF("k").repartition(nPart)
      df.agg(udaf(new BloomSkip.BloomAgg(BloomSkip.DefaultBits, BloomSkip.DefaultHashes)).apply(col("k")))
        .collect()(0).getAs[scala.collection.Seq[Long]](0).toArray
    }
    assert(bitsOf(3).toSeq === bitsOf(7).toSeq)
  }
}
