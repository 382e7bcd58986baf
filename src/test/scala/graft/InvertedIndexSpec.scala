package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.streaming.Streaming

/** Inverted-index serving layout: term lookups must partition-prune to one
  * bucket directory, postings must conserve the corpus token counts, and
  * the bucket function must agree between write (UDF) and read (driver).
  */
class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("lookup partition-prunes to the term's single bucket directory") {
    val df = InvertedIndex.lookup(spark, sf, "column")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\].*"),
      s"no partition filter on bucket in:\n${plan.take(800)}")
    // the scan's runtime metrics: exactly one bucket directory's file read
    // (the layout writes one file per bucket) of the NumBuckets on disk
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    assert(scan.metrics("numFiles").value === 1L,
      s"lookup read ${scan.metrics("numFiles").value} files, want 1")
    val allFiles = spark.read.parquet(InvertedIndex.layout(spark, sf))
      .inputFiles.length
    // one dir per bucket VALUE PRESENT in the vocabulary (empty buckets
    // write nothing); demand a real spread, not a degenerate layout
    assert(allFiles > InvertedIndex.NumBuckets / 2,
      s"layout unexpectedly small: $allFiles files")
  }

  test("lookup ≡ direct corpus tokenization") {
    val got = InvertedIndex.lookup(spark, sf, "column")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
          .as("term"))
      .filter(col("term") === "column")
      .groupBy("doc_id").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "fixture term vanished — pick a different probe term")
  }

  test("postings conserve the corpus: Σ tf = total token count") {
    val layoutTotal = spark.read.parquet(InvertedIndex.layout(spark, sf))
      .agg(sum(col("tf"))).head().getLong(0)
    val corpusTotal = Tables.documents(spark, sf)
      .select(size(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""))
        .as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(layoutTotal === corpusTotal)
  }

  test("sparse search serves from the index: pruned buckets, df/N from the layout") {
    // the postings scan the search plans (same filter) touches only the
    // query terms' bucket directories — one file per probed bucket
    val terms = Seq("data", "table", "query")
    val expectBuckets = terms.map(InvertedIndex.termBucket(_)).distinct.size
    val pruned = spark.read.parquet(InvertedIndex.layout(spark, sf))
      .filter(col("bucket").isInCollection(terms.map(InvertedIndex.termBucket(_)).distinct) &&
        col("term").isInCollection(terms))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.contains("Scan")).get
    assert(scan.metrics("numFiles").value <= expectBuckets,
      s"postings scan read ${scan.metrics("numFiles").value} files " +
        s"for $expectBuckets probed buckets")
    // and the search itself returns a full top-k
    assert(InvertedIndex.sparseSearch(spark, sf, terms).count() === 10L)
  }

  test("incremental append: new docs served immediately; N advances") {
    import spark.implicits._
    // fresh layout in a throwaway sf-keyed memo: reuse the real one but
    // restore it after — simpler: append synthetic docs with ids far
    // outside the fixture range, then verify lookup sees them
    val dirBefore = InvertedIndex.layout(spark, sf)
    val nBefore = spark.read.parquet(s"$dirBefore-meta").head().getLong(0)
    val fresh = Seq(
      (9000001L, "zzqx zzqx zzqx unique probe text"),
      (9000002L, "zzqx another arrival")).toDF("doc_id", "text")
    InvertedIndex.appendDocs(spark, sf, fresh)
    try {
      val got = InvertedIndex.lookup(spark, sf, "zzqx")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq === Seq((9000001L, 3L), (9000002L, 1L)))
      val nAfter = spark.read.parquet(s"$dirBefore-meta").head().getLong(0)
      assert(nAfter === nBefore + 2)

      // the append landed as extra files in the zzqx bucket; compaction
      // folds the bucket back to one sorted run through the atomic swap,
      // with every posting conserved and lookups unchanged
      def bucketFiles(): Int = {
        val b = InvertedIndex.termBucket("zzqx")
        spark.read.parquet(dirBefore).inputFiles
          .count(_.contains(s"bucket=$b/"))
      }
      assert(bucketFiles() >= 2, "append did not accumulate files — premise broke")
      val totalBefore = spark.read.parquet(dirBefore)
        .agg(sum(col("tf"))).head().getLong(0)
      InvertedIndex.compactPostings(spark, sf)
      assert(bucketFiles() === 1,
        s"compaction left ${bucketFiles()} files in the probed bucket")
      assert(spark.read.parquet(dirBefore).agg(sum(col("tf"))).head().getLong(0)
        === totalBefore, "compaction lost postings")
      val got2 = InvertedIndex.lookup(spark, sf, "zzqx")
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got2.toSeq === got.toSeq, "lookup changed across compaction")
    } finally {
      // restore the shared layout for other tests/queries: rebuild clean
      InvertedIndex.resetMemos()
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dirBefore), spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(dirBefore), true)
      f.delete(new org.apache.hadoop.fs.Path(s"$dirBefore-meta"), true)
      InvertedIndex.layout(spark, sf)
    }
  }

  test("streaming postings maintenance: per-trigger appends served, threshold compaction fires in-loop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = InvertedIndex.layout(spark, sf)
    val verdicts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Boolean)]()
    val input = MemoryStream[(Long, String)]
    val q = Streaming.postingsIngestStream(spark,
      input.toDF().toDF("doc_id", "text"), sf, maxFilesPerBucket = 2) {
      (id, c) => verdicts.add((id, c)); ()
    }
    try {
      // three triggers, each appending one file into the qqzz bucket —
      // the threshold (2) must trip inside the loop
      (0 until 3).foreach { i =>
        input.addData((9100000L + i, s"qqzz trigger$i payload"))
        q.processAllAvailable()
      }
      import scala.jdk.CollectionConverters._
      assert(verdicts.asScala.exists(_._2), "compaction never fired in-loop")
      // everything ever appended is still served
      val got = InvertedIndex.lookup(spark, sf, "qqzz")
        .orderBy("doc_id").collect().map(_.getLong(0))
      assert(got.toSeq === Seq(9100000L, 9100001L, 9100002L))
      // and the file counts stay bounded by the policy
      val perBucket = spark.read.parquet(dir).inputFiles
        .groupBy(f => f.split("/").init.last).values.map(_.length)
      assert(perBucket.forall(_ <= 3),
        s"file counts unbounded: max ${perBucket.max}")
    } finally {
      q.stop()
      // restore the shared layout for other suites
      InvertedIndex.resetMemos()
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      f.delete(new org.apache.hadoop.fs.Path(dir), true)
      f.delete(new org.apache.hadoop.fs.Path(s"$dir-meta"), true)
      InvertedIndex.layout(spark, sf)
    }
  }

  test("document deletes: merge-on-read exclusion, meta N exact, idempotent, compaction folds") {
    // the takedown/dedup-purge verb: tombstoned docs vanish from every
    // read face BEFORE the df aggregate (df/idf exact through the
    // uncompacted state), re-delivered and non-member deletes are no-ops
    // on N, and compaction retires the sidecar with results preserved
    val src = InvertedIndex.layout(spark, sf)
    val dir = src + "-del-spec"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(InvertedIndex.tombstonesPath(dir)), true)
    graft.operators.Hnsw.fsCopy(spark, src, dir)
    graft.operators.Hnsw.fsCopy(spark, s"$src-meta", s"$dir-meta")
    val terms = InvertedIndex.DemoTerms
    val before = InvertedIndex.sparseSearchIn(spark, dir, terms, k = 5).collect()
    val victim = before.head.getLong(0)
    val nBefore = spark.read.parquet(s"$dir-meta").head().getLong(0)
    InvertedIndex.deleteDocs(spark, dir, Seq(victim))
    val after = InvertedIndex.sparseSearchIn(spark, dir, terms, k = 5).collect()
    assert(!after.map(_.getLong(0)).contains(victim), "tombstoned doc still served")
    assert(after.length === 5, "delete shrank the served page")
    assert(spark.read.parquet(s"$dir-meta").head().getLong(0) === nBefore - 1,
      "meta N did not track the delete")
    // the single-term lookup and the batch face honor the sidecar too
    val vterm = spark.read.parquet(dir).filter(col("doc_id") === victim)
      .select("term").head().getString(0)
    assert(!InvertedIndex.lookupIn(spark, dir, vterm)
      .collect().map(_.getLong(0)).contains(victim))
    val batch = InvertedIndex.sparseSearchBatchIn(spark, dir, Seq(1L -> terms), k = 5)
      .collect()
    assert(!batch.map(_.getLong(1)).contains(victim))
    // idempotence: a re-delivered delete and a non-member id change nothing
    InvertedIndex.deleteDocs(spark, dir, Seq(victim, 123456789L))
    assert(spark.read.parquet(s"$dir-meta").head().getLong(0) === nBefore - 1,
      "re-delivered delete double-counted against N")
    // compaction folds the tombstones: sidecar gone, victim physically
    // gone, the served ranking bit-identical to the merge-on-read state
    InvertedIndex.compactPostingsIn(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(InvertedIndex.tombstonesPath(dir))),
      "tombstone sidecar survived compaction")
    assert(spark.read.parquet(dir).filter(col("doc_id") === victim).count() === 0,
      "victim's postings survived the fold")
    val afterC = InvertedIndex.sparseSearchIn(spark, dir, terms, k = 5).collect()
    assert(afterC.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      after.map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      "compaction changed the served results")
  }

  test("postings maintenance policy: compacts only above the dead-ratio/file thresholds") {
    val src = InvertedIndex.layout(spark, sf)
    val dir = src + "-policy-spec"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.delete(new org.apache.hadoop.fs.Path(InvertedIndex.tombstonesPath(dir)), true)
    graft.operators.Hnsw.fsCopy(spark, src, dir)
    graft.operators.Hnsw.fsCopy(spark, s"$src-meta", s"$dir-meta")
    // a pristine layout (1 file/bucket, no tombstones) plans all-serve
    val stats0 = InvertedIndex.postingsStats(spark, dir).collect()
    assert(stats0.forall(_.getAs[String]("decision") === "serve"),
      "fresh layout planned a compaction")
    assert(stats0.forall(_.getAs[Long]("dead_postings") === 0L))
    assert(!InvertedIndex.maintainPostings(spark, dir),
      "maintainPostings compacted a fresh layout")
    // delete ~5% of docs: dead share crosses MaintDeadRatio somewhere
    val victims = spark.read.parquet(dir).select(col("doc_id")).distinct()
      .orderBy(col("doc_id")).limit(25).collect().map(_.getLong(0)).toSeq
    InvertedIndex.deleteDocs(spark, dir, victims)
    val stats1 = InvertedIndex.postingsStats(spark, dir).collect()
    assert(stats1.exists(_.getAs[String]("decision") === "compact"),
      s"5% deletes tripped no bucket: max dead_ratio ${
        stats1.map(_.getAs[Double]("dead_ratio")).max}")
    // the verb acts: fold runs, sidecar retires, served results identical,
    // next tick all-serve and a no-op
    val before = InvertedIndex.sparseSearchIn(spark, dir, InvertedIndex.DemoTerms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(InvertedIndex.maintainPostings(spark, dir), "over-threshold debt not compacted")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(InvertedIndex.tombstonesPath(dir))))
    val after = InvertedIndex.sparseSearchIn(spark, dir, InvertedIndex.DemoTerms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "policy compaction changed the served results")
    assert(InvertedIndex.postingsStats(spark, dir).collect()
      .forall(_.getAs[String]("decision") === "serve"))
    assert(!InvertedIndex.maintainPostings(spark, dir), "maintainPostings not idempotent")
  }

  test("bucket function: write-side expression and read-side driver call agree") {
    val rows = spark.read.parquet(InvertedIndex.layout(spark, sf))
      .select("term", "bucket").distinct().collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("bucket") === InvertedIndex.termBucket(r.getAs[String]("term")))
    }
    // buckets actually spread (no degenerate single-bucket vocabulary)
    assert(rows.map(_.getAs[Int]("bucket")).distinct.length > InvertedIndex.NumBuckets / 2)
  }

  test("term_bucket codegen expression ≡ the splitmix64 UDF fold it replaced") {
    // the layout-stability pin: the native expression must hash exactly
    // like the original per-row Scala fold, or every existing postings
    // directory silently mismatches its probes — including multi-byte
    // UTF-8 terms (byte-level fold, not code points)
    graft.expressions.GraftFunctions.register(spark)
    def oldFold(term: String, n: Int): Int = {
      def mix(z0: Long): Long = {
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      var h = 0L
      term.getBytes("UTF-8").foreach { b => h = mix(h ^ (b & 0xffL)) }
      ((h >>> 1) % n).toInt
    }
    val terms = Seq("", "a", "column", "zzqx", "0", "the",
      "éclair", "naïve", "日本語", "a b", "Mixed-Case")
    import spark.implicits._
    val viaExpr = terms.toDF("t")
      .select(col("t"),
        graft.expressions.GraftFunctions.termBucket(col("t"),
          InvertedIndex.NumBuckets).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach { t =>
      assert(viaExpr(t) === oldFold(t, InvertedIndex.NumBuckets),
        s"expression diverges from the legacy fold on '$t'")
      assert(viaExpr(t) === InvertedIndex.termBucket(t),
        s"driver face diverges on '$t'")
    }
    // and the build path rides whole-stage codegen: over a real file
    // scan (a local literal frame constant-folds to LocalTableScan), the
    // bucket projection must sit inside a WholeStageCodegen span, not
    // under a fenced-off eval-UDF project
    val exec = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("t"))
      .select(graft.expressions.GraftFunctions.termBucket(col("t"),
        InvertedIndex.NumBuckets).as("b"))
      .queryExecution.executedPlan
    val inSpan = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("termbucket") => w
    }
    assert(inSpan.nonEmpty,
      s"term_bucket projection not inside a WholeStageCodegen span:\n$exec")
    val planStr = exec.toString
    assert(!planStr.contains("BatchEval") &&
      !planStr.toLowerCase.contains("scalaudf"),
      s"a UDF survived on the bucket path:\n$planStr")
  }

  test("meta N counts indexed docs, not corpus rows — a zero-token doc cannot drift it") {
    // round-10 advisor: with N initialized from raw corpus rows, a
    // punctuation-only doc is counted at layout time yet has no postings,
    // so deleteDocs (which validates membership against the postings)
    // treats its delete as a non-member no-op and N drifts permanently
    // high. N now counts distinct postings doc_ids — the docs the index
    // can actually serve and retire.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-invidx-empty")
      .toString
    Seq((1L, "alpha beta gamma"), (2L, "beta delta"), (3L, "!!! ... ---"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val dir = InvertedIndex.layout(spark, tmp)
    def n: Long = spark.read.parquet(s"$dir-meta").head().getLong(0)
    assert(n === 2L, "zero-token doc was counted into meta N")
    // deleting the zero-token doc is a no-op on N (it was never in it)
    InvertedIndex.deleteDocs(spark, dir, Seq(3L))
    assert(n === 2L)
    // deleting a real indexed doc decrements N exactly once (idempotent)
    InvertedIndex.deleteDocs(spark, dir, Seq(2L))
    assert(n === 1L)
    InvertedIndex.deleteDocs(spark, dir, Seq(2L))
    assert(n === 1L)
    // and the append face follows the same rule: a batch with one real
    // and one zero-token arrival advances N by exactly one
    InvertedIndex.appendDocs(spark, tmp,
      Seq((4L, "epsilon zeta"), (5L, "??? !!!")).toDF("doc_id", "text"))
    assert(n === 2L, "zero-token arrival inflated meta N")
  }
}
