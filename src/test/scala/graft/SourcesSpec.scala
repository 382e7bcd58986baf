package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.sources.Prepare

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("Prepare: CSV with quoted fields → embedded parquet round-trip") {
    val dir = tmpDir("graft_csv")
    val csv = s"$dir/dataset.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      """id,question,answer
        |1,"What time is check-in?","Check-in starts at 3pm, earlier on request."
        |2,"Do you allow pets?","Yes, with a ""pet fee"" of $20."
        |3,broken-row-missing-answer
        |4,Plain question,Plain answer
        |""".stripMargin)
    val docs = Prepare.fromCsv(spark, csv)
    val rows = docs.orderBy(col("id")).collect()
    // row 3 dropped (short row → null answer), like the reference's guard
    assert(rows.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 4L))
    val r2 = rows(1)
    assert(r2.getAs[String]("answer") === """Yes, with a "pet fee" of $20.""")
    assert(r2.getAs[String]("combined_text").contains(" : "))
    assert(r2.getAs[Int]("embedding_dimensions") === 64)
    // embeddings are unit-norm
    val norms = docs.select(VectorOps.norm(col("embedding"))).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
    // sink + re-read preserves everything
    val out = s"$dir/documents.parquet"
    Prepare.sink(docs, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 3)
    assert(back.schema("embedding").dataType.typeName === "array")
  }

  test("format round-trip parity: parquet vs json vs csv scan of documents") {
    val dir = tmpDir("graft_fmt")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    docs.write.mode("overwrite").parquet(s"$dir/p")
    docs.write.mode("overwrite").json(s"$dir/j")
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val p = spark.read.parquet(s"$dir/p").orderBy(col("doc_id")).collect()
    val j = spark.read.schema(docs.schema).json(s"$dir/j")
      .orderBy(col("doc_id")).collect()
    val c = spark.read.option("header", "true").schema(docs.schema)
      .csv(s"$dir/c").orderBy(col("doc_id")).collect()
    assert(p.length === 500 && j.length === 500 && c.length === 500)
    assert(p.sameElements(j))
    assert(p.sameElements(c))
  }

  test("ORC round-trip: documents and array-typed embeddings match parquet exactly") {
    val dir = tmpDir("graft_orc")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    docs.write.mode("overwrite").orc(s"$dir/docs")
    val back = spark.read.orc(s"$dir/docs").orderBy(col("doc_id")).collect()
    assert(back.sameElements(docs.orderBy(col("doc_id")).collect()))

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    emb.write.mode("overwrite").orc(s"$dir/emb")
    val eBack = spark.read.orc(s"$dir/emb").orderBy(col("vec_id")).collect()
    val eOrig = emb.orderBy(col("vec_id")).collect()
    assert(eBack.length === eOrig.length)
    eBack.zip(eOrig).foreach { case (b, o) =>
      assert(b.getSeq[Float](b.fieldIndex("embedding")) ===
        o.getSeq[Float](o.fieldIndex("embedding")))
    }
    // ORC scans support predicate pushdown too — the filter reaches the scan
    val plan = spark.read.orc(s"$dir/docs").filter(col("doc_id") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]"),
      s"no pushed filter in:\n$plan")
  }

  test("binaryFile source: image files ingest with metadata, glob-filtered, and decode end-to-end") {
    import graft.operators.MediaCodec
    // the standard multimodal ingest: a directory of raw image files →
    // (path, modificationTime, length, content) rows → the pure-JVM
    // decoder; pathGlobFilter keeps the stray sidecar file out
    val dir = tmpDir("graft_binfile")
    val png1 = MediaCodec.encodePng(5, 3, 2)
    val png2 = MediaCodec.encodePng(4, 4, 0)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.png"), png1)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.png"), png2)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/notes.txt"), "not an image")
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir)
    assert(files.schema.fieldNames.toSet ===
      Set("path", "modificationTime", "length", "content"))
    val rows = files.orderBy(col("path")).collect()
    assert(rows.length === 2, "glob filter must exclude the sidecar")
    assert(rows(0).getAs[Long]("length") === png1.length.toLong)
    // content survives byte-exact: decode the ingested bytes
    val dims = rows.map(r => {
      val px = MediaCodec.decodePixels(r.getAs[Array[Byte]]("content"))
      (px.width, px.height)
    })
    assert(dims.toSeq === Seq((5, 3), (4, 4)))
    // pushdown: a length predicate reaches the file-listing scan
    val plan = files.filter(col("length") < 10000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(length"),
      s"length filter not pushed to the binary source:\n$plan")
  }

  test("DSv2 connector: id-range pushdown prunes at the source, columns pruned at the reader") {
    val base = spark.read.format("graft_range")
      .option("n", "10000").option("slices", "8").load()
    // full scan sanity
    assert(base.count() === 10000L)
    // range pushdown: the ScanBuilder consumes the id predicates, so the
    // scan only GENERATES the matching slice — and no residual id Filter
    // survives in the physical plan
    val sliced = base.filter(col("id") >= 100 && col("id") < 200)
      .select(col("id"), col("label"))
    val rows = sliced.collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).sorted.toSeq === (100L until 200L).toSeq)
    val plan = sliced.queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Filter.*\\bid\\b.*"),
      s"id predicate not consumed by the source:\n$plan")
    // connector-level "partition pruning": the pruned scan plans at most
    // `slices` input partitions over just the 100-row slice
    assert(sliced.rdd.getNumPartitions <= 8)
    // equality with an unpruned computation
    val expect = (100L until 200L).map(i => (i, (i % 10).toInt)).toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSet === expect)
    // point lookup collapses to a single 1-row partition
    val point = base.filter(col("id") === 4242L)
    assert(point.collect().map(_.getLong(0)).toSeq === Seq(4242L))
    assert(point.rdd.getNumPartitions === 1)
  }

  test("DSv2 connector: aggregate pushdown ships digest rows, composed with the filter range") {
    val base = spark.read.format("graft_range")
      .option("n", "10000").option("slices", "8").load()
    val agg = base.filter(col("id") >= 100 && col("id") < 900)
      .selectExpr("count(*) AS n", "min(id) AS lo", "max(id) AS hi")
    val row = agg.head()
    // correctness over the filter-narrowed range
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((800L, 100L, 899L)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") || plan.contains("pushedAggs"),
      s"aggregates not pushed to the source:\n$plan")
    // the scan emitted one partial digest row per input partition — not
    // the 800 data rows
    val scanRows = agg.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numOutputRows").map(_.value)
    scanRows.foreach(n => assert(n <= 8, s"scan shipped $n rows — pushdown inert"))
    // group-by aggregates are NOT claimed: the source refuses, Spark runs
    // the ordinary scan + aggregate and the result stays correct
    val grouped = base.groupBy(col("label")).count().orderBy(col("label"))
    assert(grouped.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      (0 until 10).map(l => (l, 1000L)))
  }

  test("DSv2 connector: runtime (DPP-style) IN-filter prunes partitions and rows at execution") {
    import spark.implicits._
    import graft.sources.RangeVectors
    val fact = spark.read.format("graft_range")
      .option("n", "100000").option("slices", "16").load()
    // baseline: a plain scan plans all 16 slices
    RangeVectors.lastPlannedPartitions.set(-1)
    assert(fact.select(col("id"), col("sq")).collect().length === 100000)
    assert(RangeVectors.lastPlannedPartitions.get === 16)
    // selective broadcast dim: Spark collects the surviving join keys and
    // hands them to Scan.filter() as an IN predicate BEFORE re-planning
    // input partitions (SupportsRuntimeV2Filtering — v2's dynamic
    // partition pruning). Keys are clustered so the surviving envelope is
    // a sliver of the range.
    val useStats = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    // plain physical plan (no QueryStage wrapping) so the scan leaf and its
    // metrics are directly observable; DPP injects fine either way
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the dim must be a real source with a surviving Filter node — a
      // local Seq would constant-fold into a LocalRelation and DPP skips
      // sides without a selective predicate
      val dimDir = tmpDir("graft_dpp_dim")
      Seq((70010L, 1), (70020L, 1), (70030L, 1), (5L, 0))
        .toDF("fid", "flag").write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir)
      val joined = fact.join(broadcast(dim.filter($"flag" === 1)), $"id" === $"fid")
        .select($"id", $"sq")
      RangeVectors.lastPlannedPartitions.set(-1)
      val rows = joined.collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(70010L, 70020L, 70030L))
      assert(rows.forall(r => r.getLong(1) === r.getLong(0) * r.getLong(0)))
      val planned = RangeVectors.lastPlannedPartitions.get
      assert(planned >= 0, "scan was never re-planned")
      assert(planned < 16,
        s"runtime filter did not shrink the partition plan: $planned of 16")
      // row-level pruning inside surviving slices: the scan emits ONLY the
      // IN-set rows, not the envelope
      val scan = joined.queryExecution.executedPlan.collectLeaves()
        .find(_.toString.contains("graft_range"))
      val emitted = scan.flatMap(_.metrics.get("numOutputRows")).map(_.value)
      assert(emitted.contains(3L),
        s"scan emitted $emitted rows — runtime row skipping failed")
    } finally {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", useStats)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("JdbcStore: Derby round-trip is bit-exact and the read is partitioned") {
    val dir = "/root/testdata/sf0.001"
    val back = graft.sources.JdbcStore.readEmbeddings(spark, dir)
    val orig = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(back.rdd.getNumPartitions > 1) // parallel JDBC ranges, not one scan
    val b = back.orderBy(col("vec_id")).collect()
    val o = orig.orderBy(col("vec_id")).collect()
    assert(b.length === o.length)
    b.zip(o).foreach { case (rb, ro) =>
      assert(rb.getAs[Long]("vec_id") === ro.getAs[Long]("vec_id"))
      // float → shortest-JSON → float must round-trip every bit
      assert(rb.getSeq[Float](rb.fieldIndex("embedding")).toList ===
        ro.getSeq[Float](ro.fieldIndex("embedding")).toList)
    }
  }
}
