package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Evidence for the 100 TB design claims: IVF cell layout really prunes
  * partitions, and salted joins really equal their plain counterparts.
  */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("IVF layout: label-partitioned parquet prunes to one cell at scan time") {
    val dir = Files.createTempDirectory("graft_ivf").toFile.getAbsolutePath
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("label").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("label") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    // only 1 of the 10 label directories is read
    pruned.count() // materialize metrics
    // .get — a plan with no measurable file scan must FAIL, not skip
    val scanned = PlanTestUtil.scannedFiles(pruned).get
    assert(scanned <= 2, s"read $scanned files — pruning failed")
    assert(pruned.count() === Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("label") === 3).count())
  }

  test("range-sorted layout: parquet min/max stats skip row groups on a point predicate") {
    // The clustering/z-order-lite claim: writing the table range-
    // partitioned + sorted on the lookup key gives every file a disjoint
    // key range, so a point/range predicate pushed to the parquet reader
    // (PushedFilters) eliminates all but one file's row groups via
    // footer min/max stats — the scan emits a tiny fraction of the table
    // without any partition-directory scheme. At 100 TB this is the
    // secondary-index substitute for the non-partition key.
    val dir = Files.createTempDirectory("graft_sorted").toFile.getAbsolutePath
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = ev.count()
    ev.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(dir)
    val probe = ev.orderBy(col("event_id")).limit(1).head().getLong(0) + 3
    val point = spark.read.parquet(dir).filter(col("event_id") === probe)
    point.collect()
    val plan = point.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(event_id.*"),
      s"predicate not pushed to the reader:\n$plan")
    val outRows = point.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numOutputRows").map(_.value)
    // stats skipping: the scan must emit far fewer rows than the table
    // (≤ one file's worth of the 8 disjoint ranges)
    outRows.foreach(n => assert(n <= total / 4,
      s"scan emitted $n of $total rows — row-group stats did not skip"))
  }

  test("z-order layout: interleaved-bit clustering skips on BOTH dimensions; single-key sort does not") {
    // Multi-dimensional clustering: sort by the bit-interleaved z-value of
    // (l_orderkey, l_partkey) and every file/row-group covers a small
    // RECTANGLE of the key space, so footer min/max stats skip data for a
    // band predicate on EITHER column. The range-sorted layout above only
    // skips on its one sort key — the z-order layout is what a 100 TB
    // table uses when two lookup dimensions both matter.
    val zDir = Files.createTempDirectory("graft_zorder").toFile.getAbsolutePath
    val xDir = Files.createTempDirectory("graft_xsort").toFile.getAbsolutePath
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val total = li.count()
    // normalize both dimensions onto a dense 10-bit grid first (unequal
    // raw ranges would give one dimension's high bits all the weight),
    // then interleave: grid bit i of orderkey → z bit 2i, partkey → 2i+1
    val st = li.agg(min(col("l_orderkey")), max(col("l_orderkey")),
      min(col("l_partkey")), max(col("l_partkey"))).head()
    val (oMin, oRange) = (st.getLong(0), st.getLong(1) - st.getLong(0) + 1)
    val (pMin, pRange) = (st.getLong(2), st.getLong(3) - st.getLong(2) + 1)
    li.withColumn("zval", expr(
        s"""aggregate(sequence(0, 9), 0L, (acc, i) ->
           |  acc | shiftleft(shiftright(((l_orderkey - $oMin) * 1024) div $oRange, i) & 1, 2*i)
           |      | shiftleft(shiftright(((l_partkey - $pMin) * 1024) div $pRange, i) & 1, 2*i + 1))""".stripMargin))
      .repartitionByRange(64, col("zval")).sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(64, col("l_orderkey")).sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(xDir)
    def scanEmitted(path: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(path).filter(pred)
      q.collect() // materialize metrics
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    }
    val (oLo, pLo) = (oMin, pMin)
    val zOnOrder = scanEmitted(zDir, col("l_orderkey").between(oLo, oLo + 63))
    val zOnPart = scanEmitted(zDir, col("l_partkey").between(pLo, pLo + 63))
    val xOnPart = scanEmitted(xDir, col("l_partkey").between(pLo, pLo + 63))
    info(s"total=$total z-layout: orderkey-band=$zOnOrder partkey-band=$zOnPart; " +
      s"orderkey-sorted layout: partkey-band=$xOnPart")
    assert(zOnOrder <= total / 4,
      s"z-order did not skip on orderkey: scan emitted $zOnOrder of $total")
    // z-order trades a little single-key locality for locality in BOTH
    // dimensions: the partkey band must skip more than half the table...
    assert(zOnPart <= total / 2,
      s"z-order did not skip on partkey: scan emitted $zOnPart of $total")
    // ...while the single-key layout scatters partkey across every file →
    // its stats cannot skip for the partkey band at all
    assert(xOnPart >= (total * 9) / 10,
      s"expected the orderkey-sorted layout to scan ~everything for a partkey band, got $xOnPart")
    assert(zOnPart * 2 <= xOnPart,
      s"z-order not meaningfully better than single-key sort: $zOnPart vs $xOnPart")
  }

  test("skipping sidecar: file selection happens at planning time, superset semantics hold") {
    val sf = "/root/testdata/sf0.001"
    val all = graft.sources.SkipIndex.dataFiles(spark, sf)
    assert(all.length >= 8, s"layout produced only ${all.length} files")
    // the sidecar carries exactly one digest row per data file
    val dir = graft.sources.SkipIndex.layout(spark, sf)
    val stats = spark.read.parquet(s"$dir/stats")
    assert(stats.count() === all.length.toLong)
    // a narrow range reads a strict subset of files — the skipped files
    // never appear in the scan's file list (planning-time exclusion, not
    // footer-stats row-group skipping)
    val pruned = graft.sources.SkipIndex.prunedRead(spark, sf, 100L, 199L)
    assert(pruned.inputFiles.nonEmpty && pruned.inputFiles.length < all.length / 2,
      s"read ${pruned.inputFiles.length} of ${all.length} files — sidecar did not prune")
    // superset + residual filter ≡ the plain filtered table, row for row
    val got = pruned.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 100 && col("doc_id") <= 199)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want && want.nonEmpty)
    // a range no file can hold selects zero files and zero rows, not an error
    assert(graft.sources.SkipIndex.prunedRead(spark, sf, -500L, -1L).count() === 0L)
  }

  test("output file sizing: maxRecordsPerFile bounds every written file") {
    // The small-files/large-files control at 100 TB: a writer that emits
    // one file per task produces either 10 GB monsters (slow readers, no
    // parallelism) or millions of KB shards (NameNode/listing death).
    // maxRecordsPerFile caps rows per file so a repartitioned write rolls
    // oversized task outputs into bounded files — the knob a production
    // sink pairs with a target row size. Verify both the bound and that
    // nothing is lost.
    val dir = Files.createTempDirectory("graft_sized").toFile.getAbsolutePath
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = ev.count()
    ev.repartition(2) // 2 fat tasks...
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 150) // ...rolled into ≤150-row files
      .parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size >= (total / 150).toInt,
      s"expected the 2 task outputs rolled into ≥${total / 150} files, got ${files.size}")
    for (f <- files) {
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 150, s"${f.getName} has $n rows — cap not enforced")
    }
    assert(spark.read.parquet(dir).count() === total, "rows lost by file rolling")
  }

  test("IVF compaction: accumulated append files collapse to ⌈rows/target⌉ per cell, contents and search unchanged") {
    import graft.operators.Ann
    val dir = Files.createTempDirectory("graft_compact").toFile.getAbsolutePath + "/layout"
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"), col("embedding"))
    val cents = Ann.cellMedoids(emb, "label", "vec_id", "embedding")
    // simulate the daily maintenance loop: 4 streaming append batches,
    // each landing its own files into the cell directories
    for (b <- 0 until 4)
      Ann.appendToLayout(emb.filter(col("vec_id") % 4 === b).drop("label"),
        cents, dir, "vec_id", "embedding")
    def filesPerCell: Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerCell
    assert(before.values.max >= 4,
      s"appends should accumulate a file per batch per cell: $before")
    val total = emb.count()
    def snapshot = spark.read.parquet(dir)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .collect().map(_.toString).sorted.toSeq
    def searchTop5 = {
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      Ann.ivfSearchCells(spark.read.parquet(dir), q, "cell",
          Ann.cellMedoids(emb, "label", "vec_id", "embedding")
            .withColumn("cell", col("cell").cast("int")),
          "vec_id", "embedding", k = 5, excludeId = Some(0L), nprobe = 3)
        .collect().map(_.getLong(0)).toSeq
    }
    val (rowsBefore, topBefore) = (snapshot, searchTop5)
    // compact to 64-row target files: every cell collapses to ⌈n/64⌉
    Ann.compactLayout(spark, dir, targetRowsPerFile = 64)
    val after = filesPerCell
    assert(after.keySet === before.keySet, "compaction must not drop cells")
    val rowsPerCell = spark.read.parquet(dir).groupBy(col("cell")).count()
      .collect().map(r => s"cell=${r.get(0)}" -> r.getLong(1)).toMap
    after.foreach { case (cell, nFiles) =>
      val expect = math.ceil(rowsPerCell(cell) / 64.0).toInt
      assert(nFiles === expect,
        s"$cell: $nFiles files after compaction, expected $expect (${rowsPerCell(cell)} rows)")
    }
    assert(spark.read.parquet(dir).count() === total, "rows lost by compaction")
    assert(snapshot === rowsBefore, "compaction changed layout contents")
    assert(searchTop5 === topBefore, "compaction changed search results")
    // the swap left no droppings behind
    assert(!new java.io.File(dir + "-compact-tmp").exists())
    assert(!new java.io.File(dir + "-compact-old").exists())
  }

  test("input split sizing: maxPartitionBytes fans a monolithic file out across tasks") {
    // the read-side twin of the file-sizing test: one 10 GB file written
    // by a misbehaving upstream must not become one task — the scan
    // splits it at maxPartitionBytes boundaries (parquet row groups make
    // the offsets seekable), restoring read parallelism without any
    // rewrite. Verified: a single-file table read under a small split
    // size plans >1 input partition and loses nothing.
    val dir = Files.createTempDirectory("graft_monofile").toFile.getAbsolutePath
    // sf0.01: the rewritten single file must exceed the 16 KB split size
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = ev.count()
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet")) === 1, "fixture must be one file")
    val saved = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024).toString)
      val read = spark.read.parquet(dir)
      assert(read.rdd.getNumPartitions > 1,
        s"single file not split: ${read.rdd.getNumPartitions} partition(s)")
      assert(read.count() === total, "splitting lost rows")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None    => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("salted join equals the plain join exactly") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, "l_orderkey")
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salts = 8)
      .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2))
      .head()
    assert(plain === salted)
  }
}
