package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Graph-based ANN: a layered small-world graph (the HNSW family —
  * Malkov & Yashunin 2016) over the embeddings corpus, replacing the
  * reference's brute-force scan (`VectorSearchService.cs:189-196`) with
  * the index class most production vector stores serve from.
  *
  * BUILD (offline, engine-specific, dumped — the trained-IVF posture):
  * true HNSW construction is a sequential insert loop; the distributed
  * approximation here is the public sharded-build recipe (DiskANN's
  * overlapping-shard merge, NN-Descent's candidate blocking): each node
  * is assigned to its 2 nearest trained-KMeans cells (overlapping shards,
  * so near-boundary neighbors still meet), pairs are scored ONLY within a
  * shard — O(Σ|shard|²), never N² — and each node keeps its top-M
  * outgoing edges; reverse edges are unioned in (small-world graphs need
  * in-links to be navigable) and the degree is re-capped at 2M with the
  * same deterministic (sim desc, id asc) order. Layer 1 repeats the
  * construction over a deterministic ~1/LayerMod hash-sample of nodes —
  * the express-lane layer that gives the search a short path across the
  * corpus; the entry point is the min-id layer-1 node. The dumped
  * artifact is two tables: edges (layer, src, dst) and meta (entry).
  *
  * SEARCH (the oracle-replayed part): beam search with a FIXED hop
  * schedule — HopsL1 hops over layer 1, then HopsL0 over layer 0, beam
  * width Ef, every hop = "candidates := beam ∪ neighbors(beam); beam :=
  * top-Ef of candidates by (round(cos, 6) desc, id asc)". A fixed
  * schedule (vs HNSW's greedy convergence loop) keeps the search a
  * bounded, replayable dataflow: the DuckDB oracle unrolls the SAME hops
  * as chained CTEs over the dumped edges, so a hash match proves the
  * whole search path, not just the final set.
  *
  * 100 TB shape: per hop, the beam is ≤ Ef rows (broadcast); neighbor
  * expansion is an equi-join on src against the adjacency table — at
  * scale the edges are bucketed by src so a probe reads only matching
  * buckets — and candidates are ≤ Ef·(2M)+Ef rows before the top-Ef cut
  * (TakeOrdered, never a global sort). A query batch shares each hop's
  * pass with per-qid windows (ann_hnsw_batch). The graph build's pair
  * stage rides the existing trained-cell layout exactly like SemDeDup.
  */
object Hnsw {

  // Sized for high-dim, weakly-clustered embeddings (the fixture corpus
  // is near-isotropic — pca_variance documents the flat spectrum): real
  // HNSW deployments run M 16-48 / ef 64+; these sit at the small end of
  // that range so the sf-scale oracle replay stays readable while recall
  // clears the IVF index at a smaller scored-candidate budget (HnswSpec).
  val M = 8          // outgoing edges kept per node per layer
  val MaxDegree = 16 // cap after reverse-edge union (2M)
  val LayerMod = 8   // ~1/LayerMod of nodes promoted to layer 1
  val Ef = 16        // beam width
  val HopsL1 = 2     // hops on the express layer
  val HopsL0 = 4     // hops on the base layer
  /** Fixed hop schedule: layer per hop, top layer first. */
  val Schedule: Seq[Int] = Seq.fill(HopsL1)(1) ++ Seq.fill(HopsL0)(0)

  def edgesPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-hnsw-" + Ann.pathToken(sfDir)

  def metaPath(sfDir: String): String = edgesPath(sfDir) + "-meta"

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build + dump the layered graph for the sfDir's embeddings corpus
    * (vec_id 0 is the search fixture's query vector and stays OUT of the
    * graph). Memoized per sfDir; deterministic given the (seeded, dumped)
    * KMeans layout.
    */
  def layout(spark: SparkSession, sfDir: String): String =
    memo.computeIfAbsent(sfDir, { _ =>
      GraftFunctions.register(spark)
      val (ivfPath, cents) = Ann.kmeansLayout(spark, sfDir)
      val corpus = spark.read.parquet(ivfPath)
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      // overlapping shards: each node joins its 2 cosine-nearest cells
      // (ties by cell asc) — k·1 broadcast metadata, map-only assignment
      val wCell = Window.partitionBy(col("vec_id"))
        .orderBy(col("__csim").desc, col("__cc").asc)
      val sharded = corpus
        .crossJoin(broadcast(Ann.centroidsDf(spark, cents)
          .select(col("cell").as("__cc"), col("centroid"))))
        .withColumn("__csim",
          round(GraftFunctions.cosineSim(col("embedding"), col("centroid")), 6))
        .withColumn("__rn", row_number().over(wCell))
        .filter(col("__rn") <= 2)
        .select(col("vec_id"), col("embedding"), col("__cc").as("shard"))
      // the shard table feeds both sides of the pair join — stage it once
      val staged = sharded.localCheckpoint()
      def edgesOver(nodes: DataFrame, layer: Int): DataFrame = {
        val a = nodes.select(col("shard"), col("vec_id").as("src"),
          col("embedding").as("ea"))
        val b = nodes.select(col("shard"), col("vec_id").as("dst"),
          col("embedding").as("eb"))
        val pairs = a.join(b, Seq("shard"))
          .filter(col("src") =!= col("dst"))
          .withColumn("sim",
            round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6))
          .select(col("src"), col("dst"), col("sim"))
          // a pair meeting in both shared shards is one edge
          .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        val wSrc = Window.partitionBy(col("src"))
          .orderBy(col("sim").desc, col("dst").asc)
        val out = pairs.withColumn("__rn", row_number().over(wSrc))
          .filter(col("__rn") <= M).select(col("src"), col("dst"), col("sim"))
        // navigability: union reverse edges, re-cap at MaxDegree
        out.union(out.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
          .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
          .withColumn("__rn", row_number().over(wSrc))
          .filter(col("__rn") <= MaxDegree)
          .select(lit(layer).as("layer"), col("src"), col("dst"))
      }
      val l0 = edgesOver(staged, 0)
      val promoted = staged.filter(
        pmod(graft.functions.Digests.digest60(col("vec_id").cast("string")),
          lit(LayerMod)) === 0)
      val l1 = edgesOver(promoted, 1)
      // adjacency clustered by src: at scale this is a bucketed-by-src
      // table so each hop's probe touches only matching buckets
      l0.union(l1).repartition(col("src"))
        .write.mode("overwrite").parquet(edgesPath(sfDir))
      // meta carries the corpus MEMBERSHIP fingerprint beside the entry
      // point: the order-independent (n, digest-sum) of the indexed ids,
      // so a reader can detect "rows were appended/deleted since this
      // graph was built" from two 1-row digests (ann_stale_check) —
      // in-place vector mutation is out of scope for a membership digest
      // (the id canon carries no floats; float rendering isn't
      // cross-engine portable — the table_fingerprint caveat).
      val entry = promoted.agg(min(col("vec_id")).as("entry"))
      val fp = graft.streaming.Streaming.fingerprintStream(
        corpus.select(col("vec_id")), col("vec_id").cast("string"))
        .select(col("n_rows").as("corpus_n"), col("fp").as("corpus_fp"))
      entry.crossJoin(fp)
        .coalesce(1).write.mode("overwrite").parquet(metaPath(sfDir))
      staged.unpersist()
      edgesPath(sfDir)
    })

  /** Beam search over the dumped graph for a batch of queries
    * (`queries`: (qid, q_emb)), per-qid beams, fixed Schedule, returning
    * the per-qid top-k (qid, vec_id, sim, rnk). Single-query search is
    * the 1-row batch.
    */
  def search(spark: SparkSession, sfDir: String, queries: DataFrame,
             k: Int): DataFrame = {
    val (beam, _) = walk(spark, sfDir, queries)
    beam.withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
  }

  private def wBeam = Window.partitionBy(col("qid"))
    .orderBy(col("sim").desc, col("vec_id").asc)

  /** The one beam walk both serving faces share: fixed [[Schedule]],
    * per-qid beams, each hop localCheckpointed. Returns the final beam
    * (qid, vec_id, sim) and the VISITED candidate-id pool (qid, vec_id —
    * every id any hop scored, entry included) so the filtered face can
    * rank a predicate subset without a second walk. One definition: a
    * schedule/tie-break/checkpoint change cannot desync the two oracled
    * query families.
    */
  private def walk(spark: SparkSession, sfDir: String,
                   queries: DataFrame): (DataFrame, DataFrame) = {
    layout(spark, sfDir)
    GraftFunctions.register(spark)
    val edges = spark.read.parquet(edgesPath(sfDir))
    val meta = spark.read.parquet(metaPath(sfDir))
    val corpus = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    // every query starts at the one global entry point
    var beam = queries.select(col("qid"))
      .crossJoin(broadcast(meta.select(col("entry").as("vec_id"))))
    var visited = beam
    for (layer <- Schedule) {
      val nbrs = edges.filter(col("layer") === layer)
        .join(broadcast(beam.select(col("qid"), col("vec_id").as("src"))), Seq("src"))
        .select(col("qid"), col("dst").as("vec_id"))
      val cands = beam.select(col("qid"), col("vec_id")).union(nbrs).distinct()
      visited = visited.select(col("qid"), col("vec_id")).union(cands)
      beam = corpus.join(broadcast(cands), Seq("vec_id"))
        .join(broadcast(queries), Seq("qid"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .withColumn("__rn", row_number().over(wBeam))
        .filter(col("__rn") <= Ef)
        .select(col("qid"), col("vec_id"), col("sim"))
        .localCheckpoint() // pin each hop: the next hop re-joins this tiny frame twice
    }
    (beam, visited)
  }

  /** FILTERED graph search (the ACORN posture — Patel 2024: navigate
    * unfiltered, collect filtered): post-filtering the final beam loses
    * recall when the predicate is selective (matching nodes score below
    * the unfiltered top-Ef), so instead the search keeps every VISITED
    * candidate id — the ≤ Ef·(MaxDegree+1) ids each hop scores anyway —
    * and the final top-k ranks the predicate-passing subset of that
    * pool. The beam itself stays unfiltered: a non-matching node is
    * still a valid ROUTE to matching ones (filtering the beam would
    * strand the walk inside predicate islands). Same bounded replayable
    * dataflow: the oracle re-unions the same hop candidate sets.
    */
  def searchFiltered(spark: SparkSession, sfDir: String, queries: DataFrame,
                     k: Int, pred: org.apache.spark.sql.Column): DataFrame = {
    val (_, visited) = walk(spark, sfDir, queries)
    val corpus = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    // one scoring pass over the deduped visited pool's matching subset
    corpus.join(broadcast(visited.distinct()), Seq("vec_id"))
      .filter(pred)
      .join(broadcast(queries), Seq("qid"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
      .withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
  }

  private[graft] def resetMemos(): Unit = memo.clear()
}
