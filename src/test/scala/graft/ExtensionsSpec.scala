package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streaming

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("cosine_sim is available in bare SQL via GraftExtensions (no register call)") {
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS s").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  private def ivfQuery(path: String) = {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val ivf = spark.read.parquet(path)
    val qVec = ivf.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    ivf.filter(col("vec_id") =!= 0)
      .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), lit(qVec)), 6))
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(5)
  }

  test("IvfTopKRewrite prunes an exact top-k query to one cell, transparently") {
    val dir = "/root/testdata/sf0.001"
    val path = graft.operators.Ann.ivfLayout(spark, dir)
    try {
      // without a registered index the exact query scans everything
      graft.plans.IvfIndexRegistry.clear()
      val unpruned = ivfQuery(path)
      assert(!unpruned.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*label[^\\]]*=.*"))
      // register → the SAME query now partition-prunes
      graft.plans.IvfIndexRegistry.register(spark, path, "label", "vec_id", "embedding")
      val pruned = ivfQuery(path)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*label[^\\]]*=.*"),
        s"no cell PartitionFilters in:\n$plan")
      // the rewrite must preserve the LocalLimit (round-2 advice: rebuilding
      // only the GlobalLimit dropped per-partition top-k), so the physical
      // plan stays TakeOrderedAndProject, not a global Sort + single-
      // partition shuffle over the probed cell
      assert(plan.contains("TakeOrderedAndProject"),
        s"rewritten plan lost per-partition top-k:\n$plan")
      val rows = pruned.collect()
      // .get — a plan with no measurable file scan must FAIL, not skip
      val nf = PlanTestUtil.scannedFiles(pruned).get
      assert(nf <= 2, s"read $nf files — pruning failed")
      // identical output to the explicit probe-and-prune operator
      val explicit = SparkEntry.queries("ann_ivf")(spark, dir).collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
        explicit.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    } finally graft.plans.IvfIndexRegistry.clear()
  }

  test("IvfBatchTopKRewrite: per-qid window top-k served from probed cells; guards fall through") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    import graft.expressions.GraftFunctions
    val dir = "/root/testdata/sf0.001"
    val path = graft.operators.Ann.ivfLayout(spark, dir)
    try {
      graft.plans.IvfIndexRegistry.clear()
      GraftFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      def qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      def batch(corpusDf: DataFrame, queries: DataFrame = qs,
                keep: Seq[String] = Seq("qid", "vec_id", "label", "sim", "rnk")) = corpusDf
        .crossJoin(queries.drop("q_label"))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(keep.map(col): _*)
      def fired(df: DataFrame): Boolean = df.queryExecution.optimizedPlan.exists {
        case j: LJoin => j.right match {
          case lr: LLocal => lr.output.exists(_.name === "__graft_cell")
          case _ => false
        }
        case _ => false
      }
      // unregistered: never fires
      assert(!fired(batch(spark.read.parquet(path))), "fired without a registration")
      graft.plans.IvfIndexRegistry.register(spark, path, "label", "vec_id", "embedding")
      // the flagship batch shape fires and serves EXACTLY the explicit
      // probe-and-prune face (ann_ivf_batch over the same data)
      val served = batch(spark.read.parquet(path).filter(col("vec_id") >= 3))
      assert(fired(served), "batch cell rewrite did not fire")
      def rows(df: DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
          r.getAs[Double]("sim"), r.getAs[Int]("rnk"))).toSet
      assert(rows(served) === rows(SparkEntry.queries("ann_ivf_batch")(spark, dir)),
        "batch rewrite diverged from the explicit probe-and-prune")
      // the union-of-cells prune reaches the scan as PARTITION pruning:
      // 3 panel rows probe ≤ 3 of the 10 cell directories
      val nf = PlanTestUtil.scannedFiles(served).get
      val base = spark.read.parquet(path).filter(col("vec_id") >= 0)
      base.collect() // numFiles is populated at execution, not planning
      val total = PlanTestUtil.scannedFiles(base).get
      assert(nf < total, s"read $nf of $total files — cell pruning failed")
      // equi-conditioned join (the metadata-filtered shape) fires too,
      // and the condition acts inside each admitted cell
      def filtered(corpusDf: DataFrame) = corpusDf
        .join(qs, col("label") === col("q_label"), "inner")
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("sim"), col("rnk"))
      val servedF = filtered(spark.read.parquet(path).filter(col("vec_id") >= 3))
      assert(fired(servedF), "equi-conditioned batch shape did not fire")
      assert(rows(servedF) === rows(SparkEntry.queries("knn_batch_filtered")(spark, dir)),
        "filtered batch rewrite diverged from its registered twin")
      // a NON-equi condition falls through (conservative, documented)
      val nonEqui = spark.read.parquet(path)
        .join(qs, col("vec_id") =!= col("qid"), "inner")
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
      assert(!fired(nonEqui), "fired through a non-equi condition")
      // duplicate qids make the per-qid ranking ill-defined
      assert(!fired(batch(spark.read.parquet(path),
        queries = qs.union(qs.limit(1)))), "fired on duplicate qids")
      // a panel reading the REGISTERED table is a self-join — corpus-sized
      val selfQ = spark.read.parquet(path).filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      assert(!fired(batch(spark.read.parquet(path), queries = selfQ)),
        "fired on a self-join panel")
      // a projection that drops the cell column starves the refinement
      // join — visibility guard falls through to the exact plan
      assert(!fired(batch(spark.read.parquet(path).filter(col("vec_id") >= 3),
        keep = Seq("qid", "vec_id", "sim", "rnk"))),
        "fired with the cell column pruned away")
    } finally graft.plans.IvfIndexRegistry.clear()
  }

  test("batch probe memo is freshness-keyed: a panel-table data change re-probes instead of serving stale admissions") {
    // review finding: a canonicalized-plan memo key reads EQUAL across a
    // data change to the same panel table (relation equality is
    // rootPaths-only), so a rebuilt query after an append would serve
    // the stale admission set — the appended qid would silently vanish
    // from a rewrite's per-qid output. The key now carries the panel's
    // input-files digest.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    import graft.expressions.GraftFunctions
    val dir = "/root/testdata/sf0.001"
    val path = graft.operators.Ann.ivfLayout(spark, dir)
    val panelDir = java.nio.file.Files.createTempDirectory("graft-panel").toString + "/p"
    try {
      graft.plans.IvfIndexRegistry.clear()
      GraftFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      def panelRows(ids: Long*) = emb.filter(col("vec_id").isin(ids.map(Long.box): _*))
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      panelRows(1L, 2L).write.mode("overwrite").parquet(panelDir)
      graft.plans.IvfIndexRegistry.register(spark, path, "label", "vec_id", "embedding")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      // rebuilt FRESH per call — fresh exprIds, the cross-query memo-hit case
      def q(): DataFrame = spark.read.parquet(path).filter(col("vec_id") >= 3)
        .crossJoin(spark.read.parquet(panelDir))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("sim"), col("rnk"))
      def fired(df: DataFrame): Boolean = df.queryExecution.optimizedPlan.exists {
        case j: LJoin => j.right match {
          case lr: LLocal => lr.output.exists(_.name === "__graft_cell")
          case _ => false
        }
        case _ => false
      }
      val r1 = q()
      assert(fired(r1), "batch rewrite did not fire on the file panel")
      assert(r1.collect().map(_.getLong(0)).distinct.sorted === Array(1L, 2L))
      // append a new panel row behind the registration's back
      panelRows(5L).write.mode("append").parquet(panelDir)
      val r2 = q()
      assert(fired(r2), "batch rewrite did not fire after the panel append")
      assert(r2.collect().map(_.getLong(0)).distinct.sorted === Array(1L, 2L, 5L),
        "stale probe memo dropped the appended panel row's qid")
    } finally graft.plans.IvfIndexRegistry.clear()
  }

  test("batch precedence: graph batch rewrite outranks IVF when it fires; IVF serves what it declines") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    import graft.expressions.GraftFunctions
    val dir = "/root/testdata/sf0.001"
    graft.operators.Hnsw.layout(spark, dir)
    val corpus = graft.operators.Hnsw.rewriteCorpusLayout(spark, dir)
    try {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        graft.operators.Hnsw.edgesPath(dir), graft.operators.Hnsw.metaPath(dir))
      // IVF-register the SAME corpus table (label cells exist on the
      // rewrite corpus clone — it is the embeddings table staged)
      graft.plans.IvfIndexRegistry.register(spark, corpus, "label", "vec_id", "embedding")
      GraftFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      def marker(df: DataFrame, name: String): Boolean =
        df.queryExecution.optimizedPlan.exists {
          case j: LJoin => j.right match {
            case lr: LLocal => lr.output.exists(_.name === name)
            case _ => false
          }
          case _ => false
        }
      // graph-admissible shape: the graph batch rule fires, IVF defers
      val graphShape = spark.read.parquet(corpus)
        .crossJoin(qs.drop("q_label"))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("sim"), col("rnk"))
      assert(marker(graphShape, "__graft_qid"), "graph batch rule did not fire")
      assert(!marker(graphShape, "__graft_cell"),
        "IVF batch rule stacked on a graph-served plan")
      // a conditioned join: the graph rule declines, the IVF rule serves
      val condShape = spark.read.parquet(corpus)
        .join(qs, col("label") === col("q_label"), "inner")
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("sim"), col("rnk"))
      assert(!marker(condShape, "__graft_qid"), "graph batch rule fired on a conditioned join")
      assert(marker(condShape, "__graft_cell"),
        "IVF batch rule did not serve the shape the graph rule declined")
    } finally {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
    }
  }

  test("multi-probe transparent top-k: nprobe=2 injects a 2-cell IN, prunes, equals the explicit face, recall monotone") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val dir = "/root/testdata/sf0.001"
    val path = graft.operators.Ann.ivfLayout(spark, dir)
    try {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
      def cellsInjected(df: org.apache.spark.sql.DataFrame): Option[Int] =
        df.queryExecution.optimizedPlan.collect {
          case f: LFilter => f.condition.collect {
            case In(a: AttributeReference, vs) if a.name == "label" => vs.length
            case InSet(a: AttributeReference, vs) if a.name == "label" => vs.size
          }
        }.flatten.headOption
      // nprobe=1 (default) injects the historical EqualTo — no IN
      graft.plans.IvfIndexRegistry.register(spark, path, "label",
        "vec_id", "embedding")
      val one = ivfQuery(path)
      val rows1 = one.collect()
      assert(cellsInjected(one).isEmpty, "1-probe registration injected an IN")
      // nprobe=2 injects a TWO-cell IN and really prunes
      graft.plans.IvfIndexRegistry.register(spark, path, "label",
        "vec_id", "embedding", nprobe = 2)
      val two = ivfQuery(path)
      val rows2 = two.collect()
      assert(cellsInjected(two) === Some(2),
        s"expected a 2-cell IN, got ${cellsInjected(two)}")
      val nf = PlanTestUtil.scannedFiles(two).get
      val base = spark.read.parquet(path).filter(col("vec_id") >= 0)
      base.collect()
      assert(nf < PlanTestUtil.scannedFiles(base).get,
        s"no pruning at nprobe=2: read $nf files")
      // equals the explicit nprobe=2 probe-and-prune face bit for bit
      val qVec = spark.read.parquet(path).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val explicit = graft.operators.Ann.ivfSearchCells(
          spark.read.parquet(path),
          spark.read.parquet(path).filter(col("vec_id") === 0)
            .select(col("embedding").as("q_emb")),
          "label", graft.operators.Ann.cellMedoids(
            spark.read.parquet(path), "label", "vec_id", "embedding"),
          "vec_id", "embedding", k = 5, excludeId = Some(0L), nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(r.fieldIndex("sim"))))
      assert(rows2.map(r => (r.getLong(0), r.getDouble(2))).toSeq
        === explicit.toSeq,
        "2-probe rewrite diverged from the explicit nprobe=2 face")
      // recall monotone: each ranked sim at nprobe=2 ≥ its nprobe=1 twin
      rows1.map(_.getDouble(2)).zip(rows2.map(_.getDouble(2))).foreach {
        case (s1, s2) => assert(s2 >= s1, s"recall regressed: $s2 < $s1")
      }
      // servedBy attributes the multi-probe IN as a served top-k
      assert(graft.plans.IndexCatalog.servedBy(two)
        .exists(_.startsWith("ivf:")), "multi-probe serve not attributed")
      // nprobe ≥ cells is the exact scan — the rewrite must fall through
      graft.plans.IvfIndexRegistry.register(spark, path, "label",
        "vec_id", "embedding", nprobe = 10)
      val all = ivfQuery(path)
      all.collect()
      assert(cellsInjected(all).isEmpty &&
        graft.plans.IndexCatalog.servedBy(all).isEmpty,
        "nprobe >= cells did not fall through to the exact scan")
    } finally graft.plans.IvfIndexRegistry.clear()
  }

  test("batch markers survive the full optimizer on every fired batch face — name-free idempotence/provenance is safe") {
    // Round-13 closure of the round-12 verdict's name-fallback note. The
    // node TAG alone is provably NOT enough: on this very fixture,
    // InferFiltersFromConstraints pushes an inferred predicate onto the
    // semi-join's local side and ConvertToLocalRelation folds
    // Filter(LocalRelation) into a NEW LocalRelation — same output
    // attributes, tag gone (measured while writing this pin). The
    // attribute-METADATA stamp rides the surviving attributes, so the
    // combined marker (RewriteSupport.injectedMarkerOf) must resolve on
    // the FINAL optimized plan of all three batch faces — and exactly
    // once (a lost marker would have re-fired the rule and stacked a
    // second semi-join).
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    val dir = "/root/testdata/sf0.001"
    def markers(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case j: LJoin if j.joinType == LeftSemi => j.right match {
          case lr: LLocal =>
            graft.plans.MarkerTestAccess.markerOf(lr).toSeq
          case _ => Seq.empty[String]
        }
      }.flatten
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
      assert(markers(SparkEntry.queries("ann_hnsw_rewrite_batch")(spark, dir))
        === Seq("hnsw-batch"))
      assert(markers(SparkEntry.queries("ann_range_rewrite_batch")(spark, dir))
        === Seq("hnsw-range-batch"))
      graft.plans.HnswGraphRegistry.clear()
      assert(markers(SparkEntry.queries("ann_ivf_rewrite_batch")(spark, dir))
        === Seq("ivf-batch"))
    } finally {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
    }
  }
}

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming dedup drops replayed event ids across triggers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Ev]
    val deduped = Streaming.dedupStream(
      input.toDF().withColumn("ts", timestamp_micros($"tsMicros")))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      val min = 60L * 1000 * 1000
      input.addData(Streaming.Ev(1L, 10L, 1 * min, 1.0),
        Streaming.Ev(1L, 10L, 1 * min, 1.0), // duplicate in-batch
        Streaming.Ev(1L, 11L, 2 * min, 2.0))
      q.processAllAvailable()
      input.addData(Streaming.Ev(1L, 10L, 1 * min, 1.0)) // replay across trigger
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq === Seq(10L, 11L))
    } finally q.stop()
  }
}
