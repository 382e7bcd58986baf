package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Hnsw, Knn}

/** Quality + structural invariants for the layered small-world graph ANN
  * (operators/Hnsw.scala). The correctness gate replays the beam search
  * in DuckDB (ann_hnsw*); this spec pins the properties the replay can't
  * see: graph invariants (degree cap, layer nesting, entry membership),
  * the beam bound that makes each hop's cost O(Ef·MaxDegree), batch ≡
  * single-query serving, and recall vs the IVF index the graph is meant
  * to beat.
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("dumped graph: degree cap, layer nesting, entry point membership") {
    Hnsw.layout(spark, sf)
    val edges = spark.read.parquet(Hnsw.edgesPath(sf))
    val maxDeg = edges.groupBy(col("layer"), col("src"))
      .agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= Hnsw.MaxDegree,
      s"degree cap violated: $maxDeg > ${Hnsw.MaxDegree}")
    // layer-1 nodes are a subset of layer-0 nodes (the express lane is a
    // sample of the base graph, HNSW's nesting invariant)
    val l1NotInL0 = edges.filter(col("layer") === 1).select(col("src"))
      .except(edges.filter(col("layer") === 0).select(col("src"))).count()
    assert(l1NotInL0 === 0, s"$l1NotInL0 layer-1 nodes missing from layer 0")
    // the entry point is a layer-1 node; the query vector (0) is nowhere
    val entry = spark.read.parquet(Hnsw.metaPath(sf)).head().getLong(0)
    assert(edges.filter(col("layer") === 1 && col("src") === entry).count() > 0)
    assert(edges.filter(col("src") === 0 || col("dst") === 0).count() === 0,
      "query fixture vector 0 leaked into the graph")
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
    for (layer <- Hnsw.Schedule) {
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
}
