package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Hnsw, Knn}

/** Quality + structural invariants for the layered small-world graph ANN
  * (operators/Hnsw.scala). The correctness gate replays the beam search
  * in DuckDB (ann_hnsw*); this spec pins the properties the replay can't
  * see: graph invariants (degree cap, layer nesting across the whole
  * hierarchy, entry membership), the beam bound that makes each hop's
  * cost O(Ef·MaxDegree), the PHYSICAL I/O bound (per-hop scanned files ≤
  * the beam's bucket set — file pruning, not just row pruning), batch ≡
  * single-query serving, PQ-serving recall within ε of full precision,
  * the transparent rewrite, and recall vs the IVF index the graph is
  * meant to beat.
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def nLayers: Int = {
    Hnsw.layout(spark, sf)
    spark.read.parquet(Hnsw.metaPath(sf)).head().getAs[Int]("n_layers")
  }

  test("dumped graph: degree cap, hierarchy nesting, entry point membership") {
    Hnsw.layout(spark, sf)
    val edges = spark.read.parquet(Hnsw.edgesPath(sf))
    val maxDeg = edges.groupBy(col("layer"), col("src"))
      .agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= Hnsw.MaxDegree,
      s"degree cap violated: $maxDeg > ${Hnsw.MaxDegree}")
    // the hierarchy really is multi-layer at this corpus size, and each
    // layer's nodes are a subset of the layer below (HNSW's nesting
    // invariant, generalized): digest % 8^(l+1) = 0 implies % 8^l = 0
    val nl = nLayers
    assert(nl >= 3, s"500-node corpus should promote ≥3 layers, got $nl")
    (1 until nl).foreach { l =>
      val upNotDown = edges.filter(col("layer") === l).select(col("src"))
        .except(edges.filter(col("layer") === l - 1).select(col("src"))).count()
      assert(upNotDown === 0, s"$upNotDown layer-$l nodes missing from layer ${l - 1}")
    }
    // the entry point is a TOP-layer node; the query vector (0) is nowhere
    val entry = spark.read.parquet(Hnsw.metaPath(sf)).head().getLong(0)
    assert(edges.filter(col("layer") === (nl - 1) && col("src") === entry).count() > 0,
      s"entry $entry is not a layer-${nl - 1} node")
    assert(edges.filter(col("src") === 0 || col("dst") === 0).count() === 0,
      "query fixture vector 0 leaked into the graph")
    // physical layout: the bucket column in the directory tree matches
    // the ONE splitmix64 fold (write path and probe share TermBucket)
    val mism = edges.select(col("src"), col("src_bucket")).distinct()
      .collect().count(r => Hnsw.srcBucket(r.getLong(0)) != r.getInt(1))
    assert(mism === 0, s"$mism srcs landed in a bucket the probe would not derive")
  }

  test("beam bound: every hop scores ≤ Ef·(MaxDegree+1) candidates per query") {
    // the structural guarantee that makes serving cost independent of
    // corpus size: a beam of Ef nodes expands to at most Ef·MaxDegree
    // neighbors + the beam itself before the top-Ef cut
    Hnsw.layout(spark, sf)
    val edges = spark.read.parquet(Hnsw.edgesPath(sf))
    val meta = spark.read.parquet(Hnsw.metaPath(sf))
    var beam = meta.select(col("entry").as("vec_id"))
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
    val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    for (layer <- Hnsw.scheduleFor(nLayers)) {
      val nbrs = edges.filter(col("layer") === layer)
        .join(beam.withColumnRenamed("vec_id", "src"), Seq("src"))
        .select(col("dst").as("vec_id"))
      val cands = beam.union(nbrs).distinct()
      val n = cands.count()
      assert(n <= Hnsw.Ef * (Hnsw.MaxDegree + 1),
        s"hop on layer $layer scored $n candidates")
      beam = cands.join(emb, Seq("vec_id")).crossJoin(broadcast(q))
        .withColumn("sim", round(
          graft.expressions.GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(Hnsw.Ef)
        .select(col("vec_id")).localCheckpoint()
    }
  }

  test("DiskANN layout: no hop opens the corpus, and per-hop I/O is file-pruned to the beam's buckets") {
    // the 100 TB claim made structural, both halves: (identity) with
    // dst_emb denormalized onto the adjacency rows and entry_emb on the
    // meta, every file scan in every hop's physical plan reads the graph
    // artifact — the embeddings parquet under sfDir is NEVER a leaf of
    // the walk; (volume) the (layer, src_bucket) partitioning + the
    // per-hop literal bucket filter mean each hop PLANS at most
    // |distinct beam buckets| files — the round-9 `weak` (row-pruned but
    // not file-pruned) closed.
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    Hnsw.layout(spark, sf)
    Hnsw.collectWalkStats = true
    try {
      Hnsw.search(spark, sf, q, k = 5).collect()
      val scans = Hnsw.lastWalkScans
      val live = Hnsw.scheduleFor(nLayers)
      // fixed-point skipping may execute FEWER hops than the schedule —
      // at least one per layer phase (nLayers of them), never more than
      // the schedule, and the skip must actually engage on the fixture
      // (some phase converges before its cap — that's the serving
      // latency the skip exists to shave; value-identity of skipped
      // hops is pinned by every hash-checked ann_* oracle replay)
      assert(scans.length <= live.length + 1 && scans.length >= nLayers + 1,
        s"executed ${scans.length - 1} hops for a ${live.length}-hop schedule")
      assert(scans.length < live.length + 1,
        "the fixed-point skip never engaged on the fixture walk")
      val corpusMarker = s"$sf/embeddings"
      scans.zipWithIndex.foreach { case (ls, hop) =>
        assert(!ls.exists(_.contains(corpusMarker)),
          s"hop $hop scans the corpus: ${ls.mkString("; ").take(400)}")
      }
      // and the hops really do read the artifact, not some cached corpus:
      // each neighbor-expansion hop has the edge table as a scan leaf
      val edgeDir = Hnsw.edgesPath(sf)
      assert(scans.drop(1).forall(_.exists(_.contains(edgeDir))),
        "a neighbor hop lost its adjacency scan")
      assert(scans.head.exists(_.contains(Hnsw.metaPath(sf))),
        "the entry hop must read the meta artifact")
      // VOLUME pin (the InvertedIndexSpec numFiles pattern): each hop's
      // edge scan plans ≤ |distinct beam buckets| files — never the
      // whole artifact
      val files = Hnsw.lastWalkFiles
      assert(files.length === scans.length - 1,
        "one (files, buckets) record per executed neighbor hop")
      files.zipWithIndex.foreach { case ((nFiles, nBuckets), hop) =>
        assert(nFiles <= nBuckets,
          s"hop $hop scanned $nFiles files for a $nBuckets-bucket beam")
      }
      // the first hop probes the entry node alone — exactly one bucket,
      // at most one file: the sharpest witness that pruning is physical
      assert(files.head._2 === 1 && files.head._1 <= 1,
        s"entry-beam hop should plan ≤1 file, planned ${files.head._1}")
      // and the artifact itself holds far more files than any hop reads
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(edgeDir)
      val fs = root.getFileSystem(conf)
      val it = fs.listFiles(root, true)
      var total = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) total += 1 }
      assert(files.forall(_._1 < total),
        s"a hop read the entire $total-file artifact — no pruning happened")
    } finally Hnsw.collectWalkStats = false
    // the filtered face is a re-sort of the walk's visited pool — same
    // walk, plus zero additional file scans over the corpus
    val got = Hnsw.searchFiltered(spark, sf, q, k = 5,
      pmod(col("vec_id"), lit(3L)) === 1L)
    assert(!got.queryExecution.sparkPlan.collectLeaves()
      .exists(_.toString.contains(s"$sf/embeddings")),
      "filtered rank rescans the corpus")
    got.collect()
  }

  test("batch serving ≡ independent single-query searches") {
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val batch = Hnsw.search(spark, sf, qs, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val singles = (0L until 3L).flatMap { qid =>
      val q1 = emb.filter(col("vec_id") === qid)
        .select(lit(qid).as("qid"), col("embedding").as("q_emb"))
      Hnsw.search(spark, sf, q1, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }.toSet
    assert(batch === singles)
  }

  test("recall@5 ≥ the trained-IVF index at a smaller-or-equal candidate budget") {
    val emb = Tables.embeddings(spark, sf)
    val (path, cents) = Ann.kmeansLayout(spark, sf)
    val ivf = spark.read.parquet(path)
    val centsDf = Ann.centroidsDf(spark, cents)
    // 5 out-of-graph-entry query ids; qid 0 is out-of-corpus, 1-4 are
    // in-corpus (self excluded on both sides for a fair compare)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val (hSum, iSum) = qids.map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
      val exact = Knn.topK(emb.filter(col("vec_id") =!= qid && col("vec_id") =!= 0),
          q, "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      val qdf = emb.filter(col("vec_id") === qid)
        .select(lit(qid).as("qid"), col("embedding").as("q_emb"))
      // k=6 then drop self: in-corpus queries retrieve themselves first
      val h = Hnsw.search(spark, sf, qdf, k = 6)
        .filter(col("vec_id") =!= qid).limit(5)
        .collect().map(_.getLong(1)).toSet
      // nprobe=4 gives IVF a LARGER candidate budget (~40% of the corpus)
      // than the graph walk's ≤ hops·Ef·(MaxDegree+1) scored nodes
      val i = Ann.ivfSearchCells(ivf.filter(col("vec_id") =!= 0), q, "cell",
          centsDf, "vec_id", "embedding", k = 5, excludeId = Some(qid), nprobe = 4)
        .collect().map(_.getLong(0)).toSet
      (exact.count(h).toDouble / 5, exact.count(i).toDouble / 5)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    info(s"mean recall@5 over ${qids.size} queries: hnsw=${hSum / qids.size} ivf(nprobe=4)=${iSum / qids.size}")
    assert(hSum >= iSum,
      s"graph recall ${hSum / qids.size} < ivf recall ${iSum / qids.size}")
  }

  test("PQ serving: recall within ε of the full-precision graph at equal beam") {
    // DiskANN §3.3 — hops rank by ADC over per-edge codes, final beam
    // exact-rescored. The compression trades bytes for a bounded recall
    // hit; ε = one hit of five over the panel mean.
    val emb = Tables.embeddings(spark, sf)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val (pSum, fSum) = qids.map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
      val exact = Knn.topK(emb.filter(col("vec_id") =!= qid && col("vec_id") =!= 0),
          q, "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      val qdf = emb.filter(col("vec_id") === qid)
        .select(lit(qid).as("qid"), col("embedding").as("q_emb"))
      val p = Hnsw.searchPq(spark, sf, qdf, k = 6)
        .filter(col("vec_id") =!= qid).limit(5)
        .collect().map(_.getLong(1)).toSet
      val f = Hnsw.search(spark, sf, qdf, k = 6)
        .filter(col("vec_id") =!= qid).limit(5)
        .collect().map(_.getLong(1)).toSet
      (exact.count(p).toDouble / 5, exact.count(f).toDouble / 5)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    info(s"mean recall@5: pq-graph=${pSum / qids.size} full-graph=${fSum / qids.size}")
    assert(pSum >= fSum - 1.0, // ε = 0.2 mean recall over a 5-query panel
      s"PQ recall ${pSum / qids.size} fell >0.2 below full precision ${fSum / qids.size}")
    // PQ results are exact-rescored: every served sim must equal the true
    // rounded cosine (the ADC approximation never leaks into the output)
    val q0 = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    val served = Hnsw.searchPq(spark, sf, q0, k = 5).collect()
    assert(served.length === 5)
    val trueSims = Knn.topK(emb.filter(col("vec_id") =!= 0),
        emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb")),
        "vec_id", "embedding", k = 499, keep = Seq("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    served.foreach { r =>
      assert(math.abs(r.getDouble(2) - trueSims(r.getLong(1))) < 1e-9,
        s"served sim for ${r.getLong(1)} is not the exact rescore")
    }
    // and the PQ artifact really is smaller: code payload vs float payload
    val conf = spark.sessionState.newHadoopConf()
    def dirBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      val it = fs.listFiles(p, true)
      var b = 0L
      while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) b += f.getLen }
      b
    }
    val full = dirBytes(Hnsw.edgesPath(sf))
    val pq = dirBytes(Hnsw.pqEdgesPath(sf))
    info(s"edge artifact bytes: full=$full pq=$pq (${full.toDouble / pq}× smaller)")
    assert(pq < full / 2, s"PQ artifact $pq not meaningfully smaller than $full")
  }

  test("transparent rewrite: declarative top-k over a registered table is served by the graph") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
      Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
    try {
      val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      def declarativeK(k: Int) = spark.read.parquet(corpus).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(graft.expressions.GraftFunctions
          .cosineSim(col("embedding"), typedLit(qv)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(k)
      def declarative = declarativeK(5)
      def hasInFilter(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: Filter => f.condition
        }.exists(_.exists {
          // the optimizer converts the injected In(≥10 ids) to InSet
          case In(a: AttributeReference, vs) => a.name == "vec_id" && vs.length <= Hnsw.Ef
          case InSet(a: AttributeReference, vs) => a.name == "vec_id" && vs.size <= Hnsw.Ef
          case _ => false
        })
      val df = declarative
      assert(hasInFilter(df), "HnswTopKRewrite did not inject the beam-id filter")
      // GUARDS: a LIMIT beyond the beam width must fall through (one walk
      // cannot serve it — firing would silently truncate), and so must a
      // predicate on a non-id column (the injected id set cannot account
      // for it; that is the explicit filtered face's job)
      assert(!hasInFilter(declarativeK(Hnsw.Ef + 1)),
        "rewrite fired for k > Ef — would truncate the result")
      val nonIdFiltered = spark.read.parquet(corpus)
        .filter(size(col("embedding")) === 64)
        .select(col("vec_id"), round(graft.expressions.GraftFunctions
          .cosineSim(col("embedding"), typedLit(qv)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
      assert(!hasInFilter(nonIdFiltered),
        "rewrite fired under a non-id predicate")
      // the served set is exactly the graph's top-5 (exact-rescored by
      // the user's own sort — walk sims ARE the exact rounded cosine)
      val emb = Tables.embeddings(spark, sf)
      val q0 = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val want = Hnsw.search(spark, sf, q0, k = 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === want, "rewrite served a different set than the graph walk")
      // fall-through: unregister and the SAME query is the exact scan
      graft.plans.HnswGraphRegistry.clear()
      val clean = declarative
      val firedClean = clean.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition
      }.exists(_.exists {
        case In(a: AttributeReference, _) => a.name == "vec_id"
        case _ => false
      })
      assert(!firedClean, "rewrite fired on an unregistered table")
      val exact = Knn.topK(emb.filter(col("vec_id") =!= 0),
          emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb")),
          "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
        .collect().map(_.getLong(0)).toSet
      assert(clean.collect().map(_.getLong(0)).toSet === exact,
        "fall-through result is not the exact top-k")
      // maintenance invalidates memoized probes: after a delete on the
      // graph, a repeated (qVec, k) must re-walk — never serve the
      // deleted id from the cache
      val re = Hnsw.edgesPath(sf) + "-rewrite-inval"
      val rm = re + "-meta"
      val conf = spark.sessionState.newHadoopConf()
      Seq(Hnsw.deltaPath(re), Hnsw.replacedPath(re), Hnsw.tombstonesPath(re))
        .foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).delete(p, true)
        }
      Hnsw.fsCopy(spark, Hnsw.edgesPath(sf), re)
      Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sf)), Hnsw.shardsPath(re))
      Hnsw.fsCopy(spark, Hnsw.metaPath(sf), rm)
      val entry2 = graft.plans.HnswGraphRegistry.Entry("vec_id", "embedding", re, rm)
      val qArr = qv.map(_.toDouble).toArray
      val ids1 = graft.plans.HnswGraphRegistry.beamIds(spark, entry2, qArr)
      Hnsw.deleteFromGraph(spark, re, rm, Seq(ids1.head))
      val ids2 = graft.plans.HnswGraphRegistry.beamIds(spark, entry2, qArr)
      assert(!ids2.contains(ids1.head), "memoized probe served a deleted id")
    } finally graft.plans.HnswGraphRegistry.clear()
  }

  test("adaptive walk: recall ≥ fixed schedule, hops within caps, dumped hops replay the run") {
    val emb = Tables.embeddings(spark, sf)
    // same 5-query panel as the IVF-compare test; adaptive must never
    // lose to the fixed schedule (each phase extends the fixed walk's
    // prefix: a converged phase re-runs as no-ops, extra hops only
    // improve the monotone beam)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val (aSum, fSum) = qids.map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_emb"))
      val exact = Knn.topK(emb.filter(col("vec_id") =!= qid && col("vec_id") =!= 0),
          q, "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
        .collect().map(_.getLong(0)).toSeq
      val qdf = emb.filter(col("vec_id") === qid)
        .select(lit(qid).as("qid"), col("embedding").as("q_emb"))
      val a = Hnsw.searchAdaptive(spark, sf, qdf, k = 6)
        .filter(col("vec_id") =!= qid).limit(5)
        .collect().map(_.getLong(1)).toSet
      val f = Hnsw.search(spark, sf, qdf, k = 6)
        .filter(col("vec_id") =!= qid).limit(5)
        .collect().map(_.getLong(1)).toSet
      (exact.count(a).toDouble / 5, exact.count(f).toDouble / 5)
    }.reduce((x, y) => (x._1 + y._1, x._2 + y._2))
    info(s"mean recall@5: adaptive=${aSum / qids.size} fixed=${fSum / qids.size}")
    assert(aSum >= fSum, s"adaptive recall $aSum < fixed $fSum")
    // realized hops dumped PER PANEL (concurrent panels cannot clobber
    // the oracled dump — round-9 advisor), within the per-layer caps
    val hops = spark.read.parquet(Hnsw.adaptPathFor(sf, Seq(4L), 6)).head()
    assert(hops.getAs[Long]("h0") <= Hnsw.HopsL0Max)
    (1 until Hnsw.MaxLayersStatic).foreach { l =>
      assert(hops.getAs[Long](s"h$l") <= Hnsw.HopsPerLayer,
        s"layer $l realized ${hops.getAs[Long](s"h$l")} hops > the fixed-schedule cap")
    }
    // fixed-point soundness: a re-run of the same panel is bit-stable
    // (i.e. stopping was a true fixed point, not a truncation)
    val q0 = emb.filter(col("vec_id") === 4L)
      .select(lit(4L).as("qid"), col("embedding").as("q_emb"))
    val once = Hnsw.searchAdaptive(spark, sf, q0, k = Hnsw.Ef)
      .collect().map(_.getLong(1)).toSet
    val twice = Hnsw.searchAdaptive(spark, sf, q0, k = Hnsw.Ef)
      .collect().map(_.getLong(1)).toSet
    assert(once === twice, "adaptive walk is not deterministic")
  }

  test("maintenance: append serves the new vector top-1, delete excludes, compact folds") {
    val (de, dm) = Hnsw.maintDemoLayout(spark, sf)
    // the appended node, queried with its own embedding, is rank 1 at sim 1
    val qApp = spark.read.parquet(Hnsw.shardsPath(de))
      .filter(col("vec_id") === Hnsw.AppendedId)
      .select(lit(Hnsw.AppendedId).as("qid"), col("embedding").as("q_emb"))
      .dropDuplicates("qid")
    val top = Hnsw.searchIn(spark, de, dm, qApp, k = 3).orderBy(col("rnk")).collect()
    assert(top.head.getLong(1) === Hnsw.AppendedId,
      s"appended vector not served top-1: got ${top.head.getLong(1)}")
    assert(top.head.getDouble(2) === 1.0)
    // the tombstoned id (base top-1 of query 0) is absent; k results still served
    val tombed = spark.read.parquet(Hnsw.tombstonesPath(de))
      .collect().map(_.getLong(0)).toSet
    assert(tombed.nonEmpty)
    val emb = Tables.embeddings(spark, sf)
    val q0 = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    val got = Hnsw.searchIn(spark, de, dm, q0, k = 5).collect()
    assert(got.length === 5)
    assert(got.forall(r => !tombed.contains(r.getLong(1))),
      "tombstoned id served")
    // meta fingerprint tracked both mutations incrementally: it must
    // equal the from-scratch fingerprint of the live membership
    val liveIds = spark.read.parquet(Hnsw.shardsPath(de))
      .select(col("vec_id")).distinct()
      .join(spark.read.parquet(Hnsw.tombstonesPath(de)), Seq("vec_id"), "left_anti")
    val fresh = graft.streaming.Streaming.fingerprintStream(
      liveIds, col("vec_id").cast("string")).head()
    val meta = spark.read.parquet(dm).head()
    assert(meta.getAs[Long]("corpus_n") === fresh.getLong(0),
      "incremental corpus_n drifted from the live membership")
    assert(meta.getAs[Long]("corpus_fp") === fresh.getLong(1),
      "incremental corpus_fp drifted from the live membership")
    // OPERABILITY stats see the uncompacted debt: delta rows + the
    // tombstone, per layer of the live resolution
    val statsBefore = Hnsw.graphStats(spark, de).collect()
    assert(statsBefore.map(_.getAs[Long]("delta_rows")).sum > 0,
      "stats missed the append's delta debt")
    assert(statsBefore.forall(_.getAs[Long]("tombstones") === 1L),
      "stats missed the tombstone")
    // COMPACT on a private clone: the folded graph serves identically,
    // every sidecar is gone, and the stats debt resets
    val ce = de + "-compact-test"
    val cm = ce + "-meta"
    val conf = spark.sessionState.newHadoopConf()
    Seq(Hnsw.deltaPath(ce), Hnsw.replacedPath(ce), Hnsw.tombstonesPath(ce))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
    Seq(de -> ce, Hnsw.deltaPath(de) -> Hnsw.deltaPath(ce),
      Hnsw.replacedPath(de) -> Hnsw.replacedPath(ce),
      Hnsw.tombstonesPath(de) -> Hnsw.tombstonesPath(ce),
      Hnsw.shardsPath(de) -> Hnsw.shardsPath(ce), dm -> cm)
      .foreach { case (from, to) => Hnsw.fsCopy(spark, from, to) }
    val before = Hnsw.searchIn(spark, ce, cm, q0, k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    Hnsw.compactGraph(spark, ce, cm)
    Seq(Hnsw.deltaPath(ce), Hnsw.replacedPath(ce), Hnsw.tombstonesPath(ce))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        assert(!p.getFileSystem(conf).exists(p), s"sidecar survived compaction: $d")
      }
    val after = Hnsw.searchIn(spark, ce, cm, q0, k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(after === before, "compaction changed the served results")
    val appAfter = Hnsw.searchIn(spark, ce, cm, qApp, k = 1).head()
    assert(appAfter.getLong(1) === Hnsw.AppendedId,
      "appended vector lost in compaction")
    val statsAfter = Hnsw.graphStats(spark, ce).collect()
    assert(statsAfter.forall(r => r.getAs[Long]("delta_rows") === 0L &&
      r.getAs[Long]("replaced_srcs") === 0L && r.getAs[Long]("tombstones") === 0L),
      "stats debt did not reset after compaction")
    // IDEMPOTENCE: re-delivering a delete (at-least-once streaming) and
    // deleting a non-member must both be no-ops on the meta fingerprint
    val before2 = spark.read.parquet(cm).head()
    Hnsw.deleteFromGraph(spark, ce, cm, Seq(5555555L)) // non-member
    val metaNow = spark.read.parquet(cm).head()
    assert(metaNow.getAs[Long]("corpus_fp") === before2.getAs[Long]("corpus_fp"))
    assert(metaNow.getAs[Long]("corpus_n") === before2.getAs[Long]("corpus_n"))
    val victim = Hnsw.searchIn(spark, ce, cm, q0, k = 1).head().getLong(1)
    Hnsw.deleteFromGraph(spark, ce, cm, Seq(victim))
    val fpOnce = spark.read.parquet(cm).head().getAs[Long]("corpus_fp")
    Hnsw.deleteFromGraph(spark, ce, cm, Seq(victim, victim)) // redelivery + dup
    assert(spark.read.parquet(cm).head().getAs[Long]("corpus_fp") === fpOnce,
      "re-delivered delete corrupted the meta fingerprint")
    // ENTRY deletion: re-elects immediately; the next search still
    // navigates and never serves the deleted entry
    val entry = spark.read.parquet(cm).head().getAs[Long]("entry")
    Hnsw.deleteFromGraph(spark, ce, cm, Seq(entry))
    val meta3 = spark.read.parquet(cm).head()
    assert(meta3.getAs[Long]("entry") !== entry, "entry not re-elected")
    val served = Hnsw.searchIn(spark, ce, cm, q0, k = 3).collect()
    assert(served.length === 3)
    assert(served.forall(r => r.getLong(1) != entry && r.getLong(1) != victim),
      "a deleted id was served")
  }

  test("streaming deletes: per-trigger tombstones ≡ one batch delete") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    Hnsw.layout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val q0 = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    // two private clones of the base graph (edges + shards + meta only —
    // no demo mutations), one fed by the stream, one by a batch delete
    val conf = spark.sessionState.newHadoopConf()
    def clone(suffix: String): (String, String) = {
      val e = Hnsw.edgesPath(sf) + suffix
      val m = e + "-meta"
      Seq(Hnsw.deltaPath(e), Hnsw.replacedPath(e), Hnsw.tombstonesPath(e))
        .foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).delete(p, true)
        }
      Hnsw.fsCopy(spark, Hnsw.edgesPath(sf), e)
      Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sf)), Hnsw.shardsPath(e))
      Hnsw.fsCopy(spark, Hnsw.metaPath(sf), m)
      (e, m)
    }
    val (se, sm) = clone("-stream-del")
    val (be, bm) = clone("-batch-del")
    val base = Hnsw.searchIn(spark, se, sm, q0, k = 4)
      .collect().map(_.getLong(1))
    val toDelete = base.take(2) // the current top-2: forces a reroute
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Long]
    // data lands BEFORE start(): AvailableNow latches the source's end
    // offset when the first trigger plans, so post-start addData races
    // the latch and can be silently skipped
    ms.addData(toDelete(0))
    ms.addData(toDelete(1))
    val q = ms.toDF().select(col("value").as("vec_id"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = batch.collect().map(_.getLong(0)).toSeq
        if (ids.nonEmpty) Hnsw.deleteFromGraph(spark, se, sm, ids)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "streaming delete did not terminate")
    Hnsw.deleteFromGraph(spark, be, bm, toDelete.toSeq)
    val streamed = Hnsw.searchIn(spark, se, sm, q0, k = 4)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    val batched = Hnsw.searchIn(spark, be, bm, q0, k = 4)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(streamed === batched, "per-trigger deletes diverge from batch")
    assert(!streamed.exists(r => toDelete.contains(r._1)))
    // and the incrementally-maintained meta fps agree across the faces
    assert(spark.read.parquet(sm).head().getAs[Long]("corpus_fp") ===
      spark.read.parquet(bm).head().getAs[Long]("corpus_fp"))
  }

  test("streaming query serve: per-trigger graph search ≡ batch search") {
    // the serving face every other index family already has (the IVF
    // streaming serve): queries arrive on a stream, each trigger's batch
    // walks the SAME dumped graph, results accumulate exactly as if the
    // whole panel had been served in one batch call
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    Hnsw.layout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val panel = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val q = ms.toDF().select(col("value").as("qid"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val qs = batch.join(panel, Seq("qid"))
        if (!qs.isEmpty) {
          got ++= Hnsw.search(spark, sf, qs, k = 3)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    ms.addData(0L)
    ms.addData(1L, 2L)
    q.awaitTermination(120000)
    val want = Hnsw.search(spark, sf, panel, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got.toSet === want, "streaming serve diverged from the batch serve")
  }

  test("registry-resolved serve: graph precedence, IVF fallback, streaming twin ≡ one batch serve") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.streaming.Streaming
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val panel = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
      // an unregistered corpus refuses loudly — never a silent exact scan
      // masquerading as index serving
      intercept[RuntimeException] {
        Streaming.indexServeBatch(panel, corpus, k = 3).collect()
      }
      // IVF-only registration: served through the explicit skew-hardened
      // batch face over the entry's own medoids, output normalized
      graft.plans.IvfIndexRegistry.register(spark, corpus, "label",
        "vec_id", "embedding")
      val e = graft.plans.IvfIndexRegistry.lookup(Seq(corpus)).get
      val wantIvf = rows(Ann.ivfSearchBatchTopK(spark.read.parquet(corpus),
          panel, e.cellCol, Ann.centroidsDf(spark, e.medoids),
          "vec_id", "embedding", k = 3)
        .select(col("qid"), col("vec_id"), col("sim"), col("rnk")))
      assert(rows(Streaming.indexServeBatch(panel, corpus, k = 3)) === wantIvf,
        "IVF route diverged from the explicit batch face")
      // a graph registration on the same table takes precedence (the
      // rewrites' documented index ordering)
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      val wantGraph = rows(Hnsw.search(spark, sf, panel, k = 3))
      assert(rows(Streaming.indexServeBatch(panel, corpus, k = 3)) === wantGraph,
        "graph registration did not take precedence")
      // streaming twin: queries arriving across TWO triggers accumulate
      // exactly the one-batch serve's output (per-trigger ≡ batch)
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[Long]
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
      val q = Streaming.indexServe(
          ms.toDF().select(col("value").as("qid")).join(panel, Seq("qid")),
          corpus, k = 3) { (df, _) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        ()
      }
      try {
        ms.addData(0L)
        q.processAllAvailable()
        ms.addData(1L, 2L)
        q.processAllAvailable()
      } finally q.stop()
      assert(got.toSet === wantGraph,
        "streaming registry-resolved serve diverged from the batch serve")
      assert(got.size === wantGraph.size, "streaming serve duplicated output")
      // THRESHOLD twin, graph route: ≡ the explicit batch range walk
      val rGraph = Streaming.indexServeRangeBatch(panel, corpus, t = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val rWant = Hnsw.searchRange(spark, sf, panel, t = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rGraph === rWant, "range serve graph route diverged from the batch walk")
      // THRESHOLD twin, IVF route on a radii-armed registration: provably
      // EXACT — compare against the inline exact threshold scan (not the
      // serving face itself)
      graft.plans.HnswGraphRegistry.clear()
      val (kmPath, cents) = Ann.kmeansLayout(spark, sf)
      graft.plans.IvfIndexRegistry.registerCentroidsWithRadii(kmPath, "cell",
        "embedding", cents, Ann.loadRadii(spark, sf), idCol = Some("vec_id"))
      val rIvf = Streaming.indexServeRangeBatch(panel, kmPath, t = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      import graft.expressions.GraftFunctions
      GraftFunctions.register(spark)
      val rExact = spark.read.parquet(kmPath).crossJoin(panel)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .filter(col("sim") >= 0.2)
        .select(col("qid"), col("vec_id"), col("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rIvf === rExact,
        "range serve IVF route diverged from the exact threshold scan")
      // a top-k-only IVF registration refuses the range serve loudly
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.IvfIndexRegistry.registerCentroids(kmPath, "cell", cents)
      intercept[RuntimeException] {
        Streaming.indexServeRangeBatch(panel, kmPath, t = 0.2).collect()
      }
    } finally {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
    }
  }

  test("filtered + single-query serving symmetry: registry routes ≡ explicit faces; refusal unchanged") {
    // round-12 verdict, next-round #2 and #7: the registry-resolved serve
    // takes an optional metadata filter — graph route through the ACORN
    // pool, IVF route through the whole-cell composition with the
    // predicate applied before the per-cell rank — and a single-query
    // convenience face that must be the 1-row-panel batch serve verbatim.
    import graft.streaming.Streaming
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val panel = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val pred = pmod(col("vec_id"), lit(3L)) === 1L
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
      // unregistered: the filtered route refuses exactly like the plain one
      intercept[RuntimeException] {
        Streaming.indexServeBatch(panel, corpus, k = 3, Some(pred)).collect()
      }
      // graph route ≡ the explicit ACORN face on the registered dirs
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      val wantAcorn = rows(Hnsw.searchFilteredIn(spark, Hnsw.edgesPath(sf),
        Hnsw.metaPath(sf), panel, 3, pred))
      assert(wantAcorn.nonEmpty, "fixture predicate filtered everything — vacuous pin")
      assert(rows(Streaming.indexServeBatch(panel, corpus, k = 3, Some(pred)))
        === wantAcorn, "filtered graph route diverged from the explicit ACORN face")
      // single-query face ≡ the 1-row-panel batch serve (plain and filtered)
      val qVec = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
      val onePanel = panel.filter(col("qid") === 0L)
      def dropQid(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(r.fieldIndex("vec_id")),
          r.getDouble(r.fieldIndex("sim")), r.getInt(r.fieldIndex("rnk")))).toSet
      assert(dropQid(Streaming.indexServeOne(spark, corpus, qVec, 3))
        === dropQid(Streaming.indexServeBatch(onePanel, corpus, 3)),
        "indexServeOne diverged from the 1-row-panel batch serve")
      assert(dropQid(Streaming.indexServeOne(spark, corpus, qVec, 3, Some(pred)))
        === dropQid(Streaming.indexServeBatch(onePanel, corpus, 3, Some(pred))),
        "filtered indexServeOne diverged from the 1-row-panel batch serve")
      // IVF route: whole-cell composition — predicate applied BEFORE the
      // per-cell rank, so it equals the explicit batch face over the
      // pre-filtered corpus (exact within each probed cell)
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.register(spark, corpus, "label",
        "vec_id", "embedding")
      val e = graft.plans.IvfIndexRegistry.lookup(Seq(corpus)).get
      val wantIvf = rows(Ann.ivfSearchBatchTopK(
          spark.read.parquet(corpus).filter(pred), panel, e.cellCol,
          Ann.centroidsDf(spark, e.medoids), "vec_id", "embedding", k = 3)
        .select(col("qid"), col("vec_id"), col("sim"), col("rnk")))
      assert(wantIvf.nonEmpty)
      assert(rows(Streaming.indexServeBatch(panel, corpus, k = 3, Some(pred)))
        === wantIvf, "filtered IVF route diverged from the explicit whole-cell face")
      // an unresolvable predicate fails WITH THE CONTRACT spelled out,
      // not a bare unresolved-column error (round-13 review finding)
      val err = intercept[RuntimeException] {
        Streaming.indexServeBatch(panel, corpus, k = 3,
          Some(col("no_such_column") === 1)).collect()
      }
      assert(err.getMessage.contains("IVF") && err.getMessage.contains("route"),
        s"route-contract error missing its explanation: ${err.getMessage}")
      // STREAMING twin of the filtered serve: queries across two triggers
      // accumulate exactly the one-batch filtered serve's output
      locally {
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val ms = MemoryStream[Long]
        val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Int)]
        val q = Streaming.indexServe(
            ms.toDF().select(col("value").as("qid")).join(panel, Seq("qid")),
            corpus, k = 3, Some(pred)) { (df, _) =>
          got ++= df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          ()
        }
        try {
          ms.addData(0L); q.processAllAvailable()
          ms.addData(1L, 2L); q.processAllAvailable()
        } finally q.stop()
        assert(got.toSet === wantIvf,
          "streaming filtered serve diverged from the batch filtered serve")
        assert(got.size === wantIvf.size, "streaming filtered serve duplicated output")
      }
    } finally {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
    }
  }

  test("staleness probe: meta fingerprint matches at build, flips on any membership change") {
    Hnsw.layout(spark, sf)
    val meta = spark.read.parquet(Hnsw.metaPath(sf)).head()
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0).select(col("vec_id"))
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Streaming.fingerprintStream(
        df, col("vec_id").cast("string")).head()
    val full = fp(corpus)
    assert(full.getLong(0) === meta.getAs[Long]("corpus_n"))
    assert(full.getLong(1) === meta.getAs[Long]("corpus_fp"))
    // one dropped id (a delete) or one added id (an append) flips it
    val minus = fp(corpus.filter(col("vec_id") =!= 5))
    assert(minus.getLong(1) !== meta.getAs[Long]("corpus_fp"))
    val plus = fp(corpus.union(spark.range(1).select(lit(999999L).as("vec_id"))))
    assert(plus.getLong(1) !== meta.getAs[Long]("corpus_fp"))
  }

  test("filtered search: every hit matches the predicate, visited-pool beats post-filtering") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    val pred = pmod(col("vec_id"), lit(3L)) === 1L
    val got = Hnsw.searchFiltered(spark, sf, q, k = 5, pred).collect()
    assert(got.length === 5)
    assert(got.forall(_.getLong(1) % 3 == 1), "a hit violates the predicate")
    // visited-pool filtering must dominate naive post-filtering of the
    // final unfiltered top-k: every post-filter hit is in our result, and
    // our worst similarity is at least theirs
    val post = Hnsw.search(spark, sf, q, k = 5).collect()
      .filter(_.getLong(1) % 3 == 1)
    val gotIds = got.map(_.getLong(1)).toSet
    assert(post.forall(r => gotIds.contains(r.getLong(1))),
      "post-filter found a matching hit the visited pool missed")
    info(s"filtered@5 from visited pool: ${got.length} hits; " +
      s"post-filtering the unfiltered top-5 keeps only ${post.length}")
    // and the filtered hits really are good: each at least as similar as
    // the 5th exact FILTERED neighbor would allow for the ones we share
    val exactF = Knn.topK(emb.filter(col("vec_id") =!= 0).filter(pred),
        emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb")),
        "vec_id", "embedding", k = 5, keep = Seq("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val recall = got.count(r => exactF.contains(r.getLong(1))).toDouble / 5
    info(s"filtered recall@5 vs exact filtered scan: $recall")
    assert(recall >= 0.4, s"filtered recall collapsed: $recall")
  }

  test("rewrite guards: joins, ranges, foreign rounding/sort keys, bad registrations fall through") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    graft.plans.HnswGraphRegistry.clear()
    graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
      Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
    try {
      val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      def hasIdIn(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.collect {
          case f: Filter => f.condition
        }.exists(_.exists {
          case In(a: AttributeReference, _) => a.name == "vec_id"
          case InSet(a: AttributeReference, _) => a.name == "vec_id"
          case _ => false
        })
      def rank(base: org.apache.spark.sql.DataFrame, k: Int = 5) = base
        .select(col("vec_id"), round(graft.expressions.GraftFunctions
          .cosineSim(col("embedding"), typedLit(qv)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(k)
      // a JOIN on the spine shapes the row set — the injected id set
      // cannot account for it; must fall through (and stay correct)
      val allowed = spark.range(0, 250).select(col("id").as("vec_id"))
      val joined = rank(spark.read.parquet(corpus).join(allowed, Seq("vec_id")))
      assert(!hasIdIn(joined), "rewrite fired through a join")
      assert(joined.collect().length === 5)
      // an id RANGE is not a benign exclusion: the unfiltered beam need
      // not intersect it — fall through and serve the exact filtered top-k
      val ranged = rank(spark.read.parquet(corpus).filter(col("vec_id") >= 400))
      assert(!hasIdIn(ranged), "rewrite fired under an id range")
      assert(ranged.collect().forall(_.getLong(0) >= 400))
      // a different rounding scale resolves ties differently — fall through
      val coarse = spark.read.parquet(corpus)
        .select(col("vec_id"), round(graft.expressions.GraftFunctions
          .cosineSim(col("embedding"), typedLit(qv)), 2).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
      assert(!hasIdIn(coarse), "rewrite fired on a round-2 ranking")
      // a secondary sort key other than the id tiebreak — fall through
      val second = spark.read.parquet(corpus)
        .select(col("vec_id"), round(graft.expressions.GraftFunctions
          .cosineSim(col("embedding"), typedLit(qv)), 6).as("sim"),
          pmod(col("vec_id"), lit(7L)).as("pop"))
        .orderBy(col("sim").desc, col("pop").asc).limit(5)
      assert(!hasIdIn(second), "rewrite fired under a foreign sort key")
      // benign exclusions WITHIN the beam headroom still fire...
      val excl = rank(spark.read.parquet(corpus)
        .filter(col("vec_id") =!= 1L && col("vec_id") =!= 2L))
      assert(hasIdIn(excl), "benign id exclusions wrongly blocked the rewrite")
      // ...but k + exclusions beyond the beam width must fall through
      val tight = rank(spark.read.parquet(corpus)
        .filter(col("vec_id") =!= 1L), k = Hnsw.Ef)
      assert(!hasIdIn(tight), "rewrite fired without beam headroom")
      // a mis-registered graph (dead artifact paths) must fail the
      // REWRITE, not the query: the exact scan serves
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        "/nonexistent-graft-edges", "/nonexistent-graft-meta")
      val broke = rank(spark.read.parquet(corpus).filter(col("vec_id") =!= 0L))
      val got = broke.collect() // must not throw at planning or execution
      assert(!hasIdIn(broke), "rewrite fired against a dead artifact")
      assert(got.length === 5)
    } finally graft.plans.HnswGraphRegistry.clear()
  }

  test("index precedence: the graph rewrite outranks IVF when both are registered") {
    // one table, two registered indexes: letting both rules fire would
    // STACK the cell filter onto the graph's id-In filter — intersecting
    // two different approximations into fewer than k rows. The IVF rule
    // defers (the graph serves strictly better recall at a smaller
    // candidate budget); unregistering the graph re-enables the cell prune.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, InSet}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import graft.expressions.GraftFunctions
    Hnsw.layout(spark, sf)
    val (path, cents) = Ann.kmeansLayout(spark, sf)
    try {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.registerCentroids(path, "cell", cents)
      graft.plans.HnswGraphRegistry.register(path, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      GraftFunctions.register(spark)
      val ivf = spark.read.parquet(path)
      val qVec = ivf.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      def declarative = ivf.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(GraftFunctions
          .cosineSim(col("embedding"), lit(qVec)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(5)
      val both = declarative
      val hasIdIn = both.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition
      }.exists(_.exists {
        case In(a: AttributeReference, vs) => a.name == "vec_id" && vs.length <= Hnsw.Ef
        case InSet(a: AttributeReference, vs) => a.name == "vec_id" && vs.size <= Hnsw.Ef
        case _ => false
      })
      assert(hasIdIn, "graph rewrite did not win with both indexes registered")
      val cellPruned = both.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*=.*")
      assert(!cellPruned, "IVF cell filter stacked onto the graph rewrite")
      // the served set is the graph walk's top-5, not the IVF cell's
      val emb = Tables.embeddings(spark, sf)
      val q0 = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val want = Hnsw.search(spark, sf, q0, k = 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(both.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet === want)
      // a query the graph rule DECLINES (k > its beam width) must fall
      // through to the IVF cell prune, not to a silent full exact scan —
      // the precedence guard defers only when the graph rewrite FIRED
      val wideK = ivf.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), round(GraftFunctions
          .cosineSim(col("embedding"), lit(qVec)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(Hnsw.Ef + 1)
      val wideHasIdIn = wideK.queryExecution.optimizedPlan.collect {
        case f: Filter => f.condition
      }.exists(_.exists {
        case In(a: AttributeReference, _) => a.name == "vec_id"
        case InSet(a: AttributeReference, _) => a.name == "vec_id"
        case _ => false
      })
      assert(!wideHasIdIn, "graph rewrite fired beyond its beam width")
      assert(wideK.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*=.*"),
        "IVF did not serve the k > beam query the graph rule declined")
      // drop the graph registration: the IVF rule fires again
      graft.plans.HnswGraphRegistry.clear()
      val ivfOnly = declarative
      assert(ivfOnly.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*=.*"),
        "IVF rewrite did not resume after the graph unregistered")
    } finally {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
    }
  }

  test("streaming appends: per-trigger graph growth ≡ one batch append") {
    // the missing quadrant of the streaming maintenance matrix (deletes
    // and query-serve already have twins): new vectors arrive on a
    // stream, each trigger appends its batch; the end state must serve
    // exactly like ONE batch append of the same vectors, and the
    // additively-maintained membership fingerprints must agree
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    Hnsw.layout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val conf = spark.sessionState.newHadoopConf()
    def clone(suffix: String): (String, String) = {
      val e = Hnsw.edgesPath(sf) + suffix
      val m = e + "-meta"
      Seq(Hnsw.deltaPath(e), Hnsw.replacedPath(e), Hnsw.tombstonesPath(e))
        .foreach { d =>
          val p = new org.apache.hadoop.fs.Path(d)
          p.getFileSystem(conf).delete(p, true)
        }
      Hnsw.fsCopy(spark, Hnsw.edgesPath(sf), e)
      Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sf)), Hnsw.shardsPath(e))
      Hnsw.fsCopy(spark, Hnsw.metaPath(sf), m)
      (e, m)
    }
    def blend(id: Long, a: Long, b: Long): org.apache.spark.sql.DataFrame =
      emb.filter(col("vec_id") === a).select(col("embedding").as("__ea"))
        .crossJoin(emb.filter(col("vec_id") === b).select(col("embedding").as("__eb")))
        .select(lit(id).as("vec_id"),
          graft.functions.VectorOps.l2Normalize(
            zip_with(col("__ea"), col("__eb"),
              (x, y) => (x + y) / lit(2.0))).cast("array<float>").as("embedding"))
    // pick two new nodes whose 2-nearest-cell shard sets are DISJOINT so
    // the two appends never pair against each other — only then is
    // one-at-a-time provably edge-identical to both-at-once (two nodes
    // sharing a shard may link each other in the batch face but cannot
    // in the sequential one; that divergence is inherent to ANY
    // incremental graph index, not a bug in ours)
    val cents = Ann.centroidsDf(spark, Ann.kmeansLayout(spark, sf)._2)
    val candidates = Seq((910001L, 5L, 9L), (910002L, 101L, 202L),
      (910003L, 303L, 404L), (910004L, 57L, 311L))
    def cellsOf(nv: org.apache.spark.sql.DataFrame): Set[Int] =
      Ann.nearestCells(nv.select(col("vec_id"), col("embedding")), cents,
        "vec_id", "embedding", n = 2)
        .select(col("cell")).collect().map(_.getInt(0)).toSet
    val picked = candidates.map { case (id, a, b) => (blend(id, a, b), cellsOf(blend(id, a, b))) }
    val pair = picked.combinations(2)
      .find { case Seq((_, c1), (_, c2)) => (c1 & c2).isEmpty }
      .getOrElse(fail("no candidate pair with disjoint shard sets — extend the candidate list"))
    val Seq((nv1, _), (nv2, _)) = pair
    val (se, sm) = clone("-stream-app")
    val (be, bm) = clone("-batch-app")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    // data lands BEFORE start(): AvailableNow latches the source's end
    // offset when the first trigger plans, so post-start addData races
    // the latch and can be silently skipped
    ms.addData(1)
    ms.addData(2)
    val q = ms.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().map(_.getInt(0)).sorted.foreach { i =>
          Hnsw.appendToGraph(spark, sf, se, sm, if (i == 1) nv1 else nv2)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming append did not terminate")
    Hnsw.appendToGraph(spark, sf, be, bm, nv1.unionByName(nv2))
    // both appended nodes serve top-1 at their own embedding on BOTH faces
    Seq(nv1, nv2).foreach { nv =>
      val probe = nv.select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val id = nv.head().getLong(0)
      assert(Hnsw.searchIn(spark, se, sm, probe, k = 1).head().getLong(1) === id)
      assert(Hnsw.searchIn(spark, be, bm, probe, k = 1).head().getLong(1) === id)
    }
    // end state equivalence: a mid-corpus query panel serves identically
    val panel = emb.filter(col("vec_id").isin(0L, 7L, 42L))
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val streamed = Hnsw.searchIn(spark, se, sm, panel, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val batched = Hnsw.searchIn(spark, be, bm, panel, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(streamed === batched, "per-trigger appends diverge from batch")
    val smMeta = spark.read.parquet(sm).head()
    val bmMeta = spark.read.parquet(bm).head()
    assert(smMeta.getAs[Long]("corpus_fp") === bmMeta.getAs[Long]("corpus_fp"),
      "membership fingerprints diverge across the faces")
    assert(smMeta.getAs[Long]("corpus_n") === bmMeta.getAs[Long]("corpus_n"))
    // the maintenance policy composes with the streaming loop: two
    // appends on a 500-node graph are well under every debt threshold,
    // so the post-ingest policy tick must be a no-op (the streamed clone
    // keeps serving through merge-on-read, uncompacted)
    assert(!Hnsw.maintainGraph(spark, se, sm),
      "policy tick compacted a lightly-appended streamed graph")
    assert(Hnsw.searchIn(spark, se, sm, panel, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet === streamed,
      "the no-op policy tick changed the served results")
  }

  test("maintenance policy: maintainGraph compacts only above the debt thresholds") {
    Hnsw.layout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val conf = spark.sessionState.newHadoopConf()
    val e = Hnsw.edgesPath(sf) + "-maint-policy"
    val m = e + "-meta"
    Seq(Hnsw.deltaPath(e), Hnsw.replacedPath(e), Hnsw.tombstonesPath(e))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
    Hnsw.fsCopy(spark, Hnsw.edgesPath(sf), e)
    Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sf)), Hnsw.shardsPath(e))
    Hnsw.fsCopy(spark, Hnsw.metaPath(sf), m)
    // a pristine graph plans `serve` and maintainGraph is a no-op
    val plan0 = Hnsw.maintenancePlan(spark, e).head()
    assert(plan0.getAs[String]("decision") === "serve",
      s"fresh graph planned ${plan0.getAs[String]("decision")}")
    assert(plan0.getAs[Double]("tomb_ratio") === 0.0)
    assert(!Hnsw.maintainGraph(spark, e, m), "maintainGraph compacted a fresh graph")
    val tombP = new org.apache.hadoop.fs.Path(Hnsw.tombstonesPath(e))
    assert(!tombP.getFileSystem(conf).exists(tombP))
    // push tombstone debt over MaintTombRatio (2%): delete ~2.7% of nodes
    val liveNodes = plan0.getAs[Long]("live_nodes")
    val nDel = (liveNodes * 0.027).ceil.toInt
    val victims = spark.read.parquet(e).select(col("src")).distinct()
      .orderBy(col("src")).limit(nDel).collect().map(_.getLong(0)).toSeq
    Hnsw.deleteFromGraph(spark, e, m, victims)
    val plan1 = Hnsw.maintenancePlan(spark, e).head()
    assert(plan1.getAs[String]("decision") === "compact",
      s"tomb_ratio ${plan1.getAs[Double]("tomb_ratio")} did not trip the policy")
    assert(plan1.getAs[Double]("tomb_ratio") > Hnsw.MaintTombRatio)
    // the verb acts on the plan: compaction runs, sidecars clear, the
    // served results are preserved, and the NEXT tick is a no-op again
    val q0 = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    val before = Hnsw.searchIn(spark, e, m, q0, k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(Hnsw.maintainGraph(spark, e, m), "over-threshold debt not compacted")
    assert(!tombP.getFileSystem(conf).exists(tombP), "tombstones survived")
    val after = Hnsw.searchIn(spark, e, m, q0, k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(after === before, "policy compaction changed the served results")
    assert(before.forall(r => !victims.contains(r._1)))
    val plan2 = Hnsw.maintenancePlan(spark, e).head()
    assert(plan2.getAs[String]("decision") === "serve")
    assert(!Hnsw.maintainGraph(spark, e, m), "maintainGraph not idempotent")
  }

  test("hot-shard guard: over-cap shards split deterministically, pair work bounded, fixtures untouched") {
    import spark.implicits._
    // a deliberately skewed assignment: 3000 nodes in ONE hot shard (the
    // 100×-scale hot-cell shape), 100 in a cold one
    def emb(id: Long): Seq[Float] = {
      val r = new scala.util.Random(id)
      Seq.fill(8)(r.nextFloat())
    }
    val rows = (1L to 3000L).map(i => (i, emb(i), 0)) ++
      (100001L to 100100L).map(i => (i, emb(i), 7))
    val staged = rows.toDF("vec_id", "embedding", "shard")
    val capped = Hnsw.capShards(staged).localCheckpoint()
    val sizes = capped.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // membership preserved exactly; the cold shard untouched, id and all
    assert(capped.count() === 3100L)
    assert(capped.select("vec_id").except(staged.select("vec_id")).count() === 0L)
    assert(sizes(7) === 100L)
    // every shard under the cap (non-degenerate vectors split cleanly)
    assert(sizes.values.forall(_ <= Hnsw.ShardCap),
      s"an over-cap shard survived the guard: $sizes")
    // the pair-work budget the guard exists for: Σ|s|² shrank ≥ 4×
    val before = 3000.0 * 3000 + 100.0 * 100
    val after = sizes.values.map(c => c.toDouble * c).sum
    assert(after < before / 4, s"split bought too little: $after vs $before")
    // pure function of the input: a second run reproduces the exact
    // (vec_id → shard) assignment
    val a1 = capped.select("vec_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = Hnsw.capShards(staged).select("vec_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 === a2, "split assignment is not deterministic")
    // fixture scale: the guard is idle — every dumped shard sits under
    // the cap, so existing graphs build byte-identically
    Hnsw.layout(spark, sf)
    val fixtureMax = spark.read.parquet(Hnsw.shardsPath(Hnsw.edgesPath(sf)))
      .groupBy("shard").count().agg(max("count")).head().getLong(0)
    assert(fixtureMax <= Hnsw.ShardCap,
      s"fixture shard $fixtureMax exceeds the cap — graphs would change")
  }

  test("small-panel driver fold ≡ bulk-panel distributed walk, face by face") {
    // the serving path has two implementations per face — the map-only
    // probe + driver fold for API-sized panels, the distributed
    // union+distinct+window for bulk panels — and they must be
    // value-identical. Force the bulk path by shrinking the pin bound.
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    def run[T](f: => T): (T, T) = {
      Hnsw.layout(spark, sf)
      val small = f
      val saved = Hnsw.PinHopMaxRows
      Hnsw.PinHopMaxRows = 0
      try { (small, f) } finally Hnsw.PinHopMaxRows = saved
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (s1, l1) = run(rows(Hnsw.search(spark, sf, qs, k = 3)))
    assert(s1 === l1, "fixed-schedule walk: small ≠ large")
    val (s2, l2) = run(rows(Hnsw.searchPq(spark, sf, qs, k = 3)))
    assert(s2 === l2, "PQ walk: small ≠ large")
    val (s3, l3) = run(Hnsw.searchRange(spark, sf, qs, t = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
    assert(s3 === l3, "range walk: small ≠ large")
    val (s4, l4) = run(rows(Hnsw.searchAdaptive(spark, sf, qs, k = 3)))
    assert(s4 === l4, "adaptive walk: small ≠ large")
  }

  test("merge-on-read resolution: literal predicates ≡ broadcast joins on a mutated graph") {
    // the sidecar state serves as literal filters when batch-sized and
    // as broadcast joins above MorLiteralMaxRows (a 100 TB graph's
    // replaced sidecar can be large long before the debt RATIO trips the
    // policy); both paths must serve identical results through the same
    // base ∪ delta − tombstones state
    val (de, dm) = Hnsw.maintDemoLayout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    def serve(): Seq[(Long, Long, Double, Int)] =
      Hnsw.searchIn(spark, de, dm, q, k = 5).orderBy(col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val viaLiterals = serve()
    val saved = Hnsw.MorLiteralMaxRows
    Hnsw.MorLiteralMaxRows = 0
    try {
      assert(serve() === viaLiterals,
        "join-fallback resolution diverged from the literal path")
      // the whole-graph face resolves identically too
      Hnsw.MorLiteralMaxRows = saved
      val litGraph = Hnsw.readGraph(spark, de)
        .select("layer", "src", "dst").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      Hnsw.MorLiteralMaxRows = 0
      val joinGraph = Hnsw.readGraph(spark, de)
        .select("layer", "src", "dst").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(litGraph === joinGraph)
    } finally Hnsw.MorLiteralMaxRows = saved
  }

  test("graph range search: full recall vs the exact threshold scan at the served t; bounded and safe on an unreachable t") {
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0)
      .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
    def exactAt(t: Double): Set[(Long, Double)] = emb
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
      .filter(col("sim") >= t)
      .select(col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // the served t (the oracled query's 0.2): the bounded expansion must
    // reach EVERY qualifying node on the fixture — threshold results are
    // the dedup-serving face, where a miss is a silent false-unique
    val got = Hnsw.searchRange(spark, sf, q, t = 0.2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(got === exactAt(0.2),
      s"range walk missed ${(exactAt(0.2) -- got).size} of the exact ≥0.2 set")
    // an unreachable t returns empty without error (frontier never forms)
    assert(Hnsw.searchRange(spark, sf, q, t = 0.999).collect().isEmpty)
  }

  test("transparent range rewrite (graph): SQL threshold shape served by the walk; guards fall through") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference => CAttr, In => CIn, InSet => CInSet}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    def fired(df: DataFrame): Boolean = df.queryExecution.optimizedPlan.exists {
      case f: LFilter => f.condition.exists {
        case CIn(a: CAttr, _) => a.name == "vec_id"
        case CInSet(a: CAttr, _) => a.name == "vec_id"
        case _ => false
      }
      case _ => false
    }
    def rangeQ(t: Double) = spark.read.parquet(corpus)
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col("embedding"), typedLit(qv)), 6))
      .filter(col("sim") >= t)
      .select(col("vec_id"), col("sim"))
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      // served result ≡ the explicit range face (the user's own predicate
      // exact-rescored the injected visited-≥ t pool)
      val served = rangeQ(0.2)
      assert(fired(served), "graph range rewrite did not fire")
      val q = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val explicit = Hnsw.searchRange(spark, sf, q, t = 0.2)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(served.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        === explicit, "transparent range face diverged from the explicit walk")
      // a benign id exclusion composes (result = walk set minus the id)...
      val excl = spark.read.parquet(corpus).filter(col("vec_id") =!= 0L)
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), typedLit(qv)), 6))
        .filter(col("sim") >= 0.2)
        .select(col("vec_id"), col("sim"))
      assert(fired(excl), "benign id exclusion blocked the range rewrite")
      assert(excl.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        === explicit.filterNot(_._1 == 0L))
      // fall-throughs, each leaving the exact plan:
      // (a) the raw (unrounded) cosine draws the ≥ t boundary differently
      //     than the walk's round-6 cut
      val raw = spark.read.parquet(corpus)
        .withColumn("sim", GraftFunctions.cosineSim(col("embedding"), typedLit(qv)))
        .filter(col("sim") >= 0.2).select(col("vec_id"), col("sim"))
      assert(!fired(raw), "range rewrite fired on a raw-cosine threshold")
      // (b) a non-benign predicate (id range) compounds recall loss —
      //     the explicit ACORN face's job
      val rangePred = spark.read.parquet(corpus)
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), typedLit(qv)), 6))
        .filter(col("sim") >= 0.2 && col("vec_id") >= 100L)
        .select(col("vec_id"), col("sim"))
      assert(!fired(rangePred), "range rewrite fired under an id-range predicate")
      // (c) inside an OR a failing sim no longer implies a failing row
      val orQ = spark.read.parquet(corpus)
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), typedLit(qv)), 6))
        .filter(col("sim") >= 0.2 || col("vec_id") === 3L)
        .select(col("vec_id"), col("sim"))
      assert(!fired(orQ), "range rewrite fired on an OR condition")
      // (d) unregistered → exact scan, same rows
      graft.plans.HnswGraphRegistry.clear()
      assert(!fired(rangeQ(0.2)), "range rewrite fired unregistered")
    } finally graft.plans.HnswGraphRegistry.clear()
  }

  test("maintenance plan on a pure-debt graph decides compact, never serve") {
    // round-10 advisor: a fully-tombstoned graph resolves to ZERO live
    // nodes/edges; raw ratio divisions then yield nulls, every threshold
    // compare reads false, and the plan would say `serve` on a graph
    // that is pure debt. Forge exactly that state — a clone whose
    // tombstone sidecar names EVERY member (the hand-mutated-clone class
    // the walk already defends against) — and pin the guarded ratios.
    import spark.implicits._
    Hnsw.layout(spark, sf)
    val conf = spark.sessionState.newHadoopConf()
    val e = Hnsw.edgesPath(sf) + "-alldebt"
    Seq(Hnsw.deltaPath(e), Hnsw.replacedPath(e), Hnsw.tombstonesPath(e))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
    Hnsw.fsCopy(spark, Hnsw.edgesPath(sf), e)
    Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sf)), Hnsw.shardsPath(e))
    spark.read.parquet(Hnsw.shardsPath(e)).select(col("vec_id")).distinct()
      .write.mode("overwrite").parquet(Hnsw.tombstonesPath(e))
    val plan = Hnsw.maintenancePlan(spark, e).head()
    assert(plan.getAs[Long]("live_edges") === 0L,
      "forged state unexpectedly kept live edges")
    assert(plan.getAs[Double]("tomb_ratio") === 1.0,
      "zero live nodes with nonzero tombstones must read as maximal debt")
    assert(plan.getAs[String]("decision") === "compact",
      "a pure-debt graph read as healthy")
  }

  test("batch-face transparent rewrite: per-qid window top-k probes ONE batch walk") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    import graft.expressions.GraftFunctions
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      GraftFunctions.register(spark)
      val emb = Tables.embeddings(spark, sf)
      def qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      def batch(corpusDf: DataFrame, queries: DataFrame = qs, k: Int = 3) = corpusDf
        .crossJoin(queries)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
      def fired(df: DataFrame): Boolean = df.queryExecution.optimizedPlan.exists {
        case j: LJoin => j.right match {
          case lr: LLocal => lr.output.exists(_.name === "__graft_qid")
          case _ => false
        }
        case _ => false
      }
      // the flagship shape fires and serves EXACTLY the explicit batch walk
      val served = batch(spark.read.parquet(corpus).filter(col("vec_id") =!= 0))
      assert(fired(served), "batch rewrite did not fire")
      val got = served.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val want = Hnsw.search(spark, sf, qs, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(got === want, "batch rewrite diverged from the explicit batch walk")
      // the superset In pushes into the corpus scan: beam-sized I/O, not
      // a full scan refiltered post-hoc (the 100 TB shape)
      assert(served.queryExecution.executedPlan.toString
        .matches("(?s).*PushedFilters: \\[[^\\]]*In\\(vec_id[^\\]]*\\].*"),
        "union-of-beams In filter did not reach the corpus scan")
      // guards, each falling through to the exact plan:
      // k beyond the beam width
      assert(!fired(batch(spark.read.parquet(corpus), k = Hnsw.Ef + 1)),
        "fired beyond the beam width")
      // a non-benign corpus predicate (id range)
      assert(!fired(batch(spark.read.parquet(corpus).filter(col("vec_id") >= 100))),
        "fired under an id range")
      // a coarser rounding ranks differently
      val coarse = spark.read.parquet(corpus).crossJoin(qs)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 2))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
      assert(!fired(coarse), "fired on a round-2 ranking")
      // rank() has different tie semantics than the walk's row_number
      val rankFn = spark.read.parquet(corpus).crossJoin(qs)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
      assert(!fired(rankFn), "fired on rank() tie semantics")
      // duplicate qids make the per-qid ranking ill-defined
      assert(!fired(batch(spark.read.parquet(corpus),
        queries = qs.union(qs.limit(1)))), "fired on duplicate qids")
      // a self-join (query side IS the registered corpus) is corpus-sized
      val selfQ = spark.read.parquet(corpus).filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      val self = spark.read.parquet(corpus).crossJoin(selfQ)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
      // (the two scans are separate LogicalRelation instances, so this MAY
      // legitimately fire — what must hold either way is correctness)
      assert(self.collect().length === 9)
      // a join CONDITION shapes the per-qid row set — fall through
      val conditioned = spark.read.parquet(corpus)
        .join(qs, col("vec_id") =!= col("qid"), "inner")
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
      assert(!fired(conditioned), "fired through a conditioned join")
      // an unregistered corpus never fires
      graft.plans.HnswGraphRegistry.clear()
      assert(!fired(batch(spark.read.parquet(corpus))),
        "fired without a registration")
    } finally graft.plans.HnswGraphRegistry.clear()
  }

  test("a user-written id IN list is not mistaken for the graph's beam filter") {
    // round-10 advisor: the IVF precedence guard matched the graph's
    // injected In by column NAME alone, so a USER predicate
    // `vec_id IN (<many ids>)` — which makes the graph rule decline (In
    // is not a benign exclusion) — still read as "the graph fired" and
    // IVF deferred into a silent full exact scan. The hardened guard
    // requires the relation's resolved id attribute AND an In list that
    // fits the beam width; a >Ef user list now falls through to the
    // cell prune.
    import graft.expressions.GraftFunctions
    Hnsw.layout(spark, sf)
    val (path, cents) = Ann.kmeansLayout(spark, sf)
    try {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.registerCentroids(path, "cell", cents)
      graft.plans.HnswGraphRegistry.register(path, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      GraftFunctions.register(spark)
      val ivf = spark.read.parquet(path)
      val qVec = ivf.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val manyIds = (1L to 100L).map(java.lang.Long.valueOf)
      val q = ivf.filter(col("vec_id").isin(manyIds: _*))
        .select(col("vec_id"), round(GraftFunctions
          .cosineSim(col("embedding"), lit(qVec)), 6).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(5)
      assert(q.queryExecution.executedPlan.toString
        .matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*=.*"),
        "IVF deferred on a user In list the graph rule had declined")
      // and the result is still the exact top-5 within the user's list
      // restricted to the probed cell's members that carry it — i.e. the
      // query EXECUTES correctly through both filters
      val got = q.collect()
      assert(got.forall(r => r.getLong(0) >= 1L && r.getLong(0) <= 100L))
    } finally {
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.clear()
    }
  }

  test("batch range rewrite: corpus × panel threshold shape served by ONE batch walk; guards fall through") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, LocalRelation => LLocal}
    import graft.expressions.GraftFunctions
    GraftFunctions.register(spark)
    Hnsw.layout(spark, sf)
    val corpus = Hnsw.rewriteCorpusLayout(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    def qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    def fired(df: DataFrame): Boolean = df.queryExecution.optimizedPlan.exists {
      case j: LJoin => j.right match {
        case lr: LLocal => lr.output.exists(_.name === "__graft_rqid")
        case _ => false
      }
      case _ => false
    }
    def rangeQ(corpusDf: DataFrame, queries: DataFrame = qs, rounded: Boolean = true) = {
      val cs = GraftFunctions.cosineSim(col("embedding"), col("q_emb"))
      corpusDf.crossJoin(queries)
        .withColumn("sim", if (rounded) round(cs, 6) else cs)
        .filter(col("sim") >= 0.2)
        .select(col("qid"), col("vec_id"), col("sim"))
    }
    try {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
      graft.plans.HnswGraphRegistry.register(corpus, "vec_id", "embedding",
        Hnsw.edgesPath(sf), Hnsw.metaPath(sf))
      // the batch threshold shape fires and serves EXACTLY the explicit
      // batch range walk, per qid
      val served = rangeQ(spark.read.parquet(corpus))
      assert(fired(served), "batch range rewrite did not fire")
      val got = served.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Hnsw.searchRange(spark, sf, qs, t = 0.2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want, "batch range rewrite diverged from the explicit batch walk")
      // the union-of-pools In pushes into the corpus scan
      assert(served.queryExecution.executedPlan.toString
        .matches("(?s).*PushedFilters: \\[[^\\]]*In\\(vec_id[^\\]]*\\].*"),
        "union-of-pools In filter did not reach the corpus scan")
      // a benign id exclusion composes (result = pool minus the id)
      val excl = rangeQ(spark.read.parquet(corpus).filter(col("vec_id") =!= 0L))
      assert(fired(excl), "benign id exclusion blocked the batch range rewrite")
      assert(excl.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        === want.filterNot(_._2 == 0L))
      // fall-throughs, each leaving the exact plan:
      // (a) raw cosine draws the boundary differently than the walk's cut
      assert(!fired(rangeQ(spark.read.parquet(corpus), rounded = false)),
        "batch range rewrite fired on a raw-cosine threshold")
      // (b) a non-benign corpus predicate (id range)
      assert(!fired(rangeQ(spark.read.parquet(corpus).filter(col("vec_id") >= 100L))),
        "batch range rewrite fired under an id-range predicate")
      // (c) duplicate qids
      assert(!fired(rangeQ(spark.read.parquet(corpus),
        queries = qs.union(qs.limit(1)))), "fired on duplicate qids")
      // (c1b) a NON-DETERMINISTIC filter the optimizer cannot combine
      //       rides the spine between threshold and join — audited now
      //       (review finding: spineJoin previously discarded it)
      // (rand >= 0.5, not >= 0.0 — the optimizer deletes the trivially
      //  true comparison outright and the spine is then legitimately
      //  clean, which is what the first draft of this pin measured)
      val sampled = spark.read.parquet(corpus).crossJoin(qs)
        .filter(rand(7) >= 0.5)
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .filter(col("sim") >= 0.2)
        .select(col("qid"), col("vec_id"), col("sim"))
      assert(!fired(sampled),
        "batch range rewrite fired under a non-deterministic spine filter")
      // (c2) an equi-join CONDITION under walk-served candidates
      //      compounds recall loss — audited in BOTH optimizer shapes
      //      (the Filter-above-join form previously skipped the ON
      //      condition entirely; review finding)
      val qsLab = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      val condJoin = spark.read.parquet(corpus)
        .join(qsLab, col("label") === col("q_label"), "inner")
        .withColumn("sim", round(GraftFunctions
          .cosineSim(col("embedding"), col("q_emb")), 6))
        .filter(col("sim") >= 0.2)
        .select(col("qid"), col("vec_id"), col("sim"))
      assert(!fired(condJoin), "batch range rewrite fired through an equi-join condition")
      // (d) a self-join panel (query side IS the registered corpus)
      val selfQ = spark.read.parquet(corpus).filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      assert(!fired(rangeQ(spark.read.parquet(corpus), queries = selfQ)),
        "fired on a self-join panel")
      // (e) registry-state precedence: a radii-armed IVF registration on
      //     the same table owns threshold serving — the approximate graph
      //     rule must decline OUTRIGHT, first pass included
      graft.plans.IvfIndexRegistry.registerCentroidsWithRadii(corpus, "label",
        "embedding", Ann.kmeansLayout(spark, sf)._2, Ann.loadRadii(spark, sf))
      assert(!fired(rangeQ(spark.read.parquet(corpus))),
        "graph batch range rewrite fired over a radii-armed IVF registration")
      graft.plans.IvfIndexRegistry.clear()
      // (f) unregistered → exact scan
      graft.plans.HnswGraphRegistry.clear()
      assert(!fired(rangeQ(spark.read.parquet(corpus))),
        "batch range rewrite fired unregistered")
    } finally {
      graft.plans.HnswGraphRegistry.clear()
      graft.plans.IvfIndexRegistry.clear()
    }
  }
}
