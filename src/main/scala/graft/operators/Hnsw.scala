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
  * 100 TB shape (the DiskANN disk layout — Subramanya 2019 stores each
  * node's neighbor ids AND their vectors in the node's disk block): the
  * adjacency rows carry `dst_emb`, a denormalized copy of dst's
  * embedding, so a hop is ONE equi-join on src against the src-clustered
  * edge table — at scale bucketed by src, a probe reads only matching
  * buckets — and scoring happens on the join output itself. The corpus
  * table is NEVER read on the serving path (HnswSpec pins the scan set
  * of every hop to the graph artifact); serving cost per hop is
  * ≤ Ef·(2M)+Ef scored rows (TakeOrdered, never a global sort),
  * independent of corpus size for real. The storage price is explicit
  * and bounded: ≤ MaxDegree+1 copies of each vector live in the
  * artifact — the standard graph-ANN trade (DiskANN §3.2) of duplicated
  * vector bytes for single-seek hops. A query batch shares each hop's
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
      // (ONE assignment formula — Ann.nearestCells), map-only against
      // the broadcast k·1 centroid metadata
      val sharded = Ann.nearestCells(corpus,
          Ann.centroidsDf(spark, cents), "vec_id", "embedding", n = 2)
        .select(col("vec_id"), col("embedding"), col("cell").as("shard"))
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
      // DiskANN layout: denormalize dst's embedding onto the adjacency
      // row (one build-time join against the staged shards), so serving
      // hops read ONLY the src-clustered edge table and never the corpus.
      // Clustered by src: at scale this is a bucketed-by-src table so
      // each hop's probe touches only matching buckets.
      val dstEmb = staged.select(col("vec_id").as("dst"),
        col("embedding").as("dst_emb")).dropDuplicates("dst")
      l0.union(l1).join(dstEmb, Seq("dst"))
        .select(col("layer"), col("src"), col("dst"), col("dst_emb"))
        .repartition(col("src"))
        .write.mode("overwrite").parquet(edgesPath(sfDir))
      // shard-membership sidecar, partitioned by shard: appendToGraph
      // pairs new nodes against ONLY their touched shards (pruned read)
      staged.select(col("vec_id"), col("embedding"), col("shard"))
        .write.mode("overwrite").partitionBy("shard")
        .parquet(shardsPath(edgesPath(sfDir)))
      // meta carries the corpus MEMBERSHIP fingerprint beside the entry
      // point: the order-independent (n, digest-sum) of the indexed ids,
      // so a reader can detect "rows were appended/deleted since this
      // graph was built" from two 1-row digests (ann_stale_check) —
      // in-place vector mutation is out of scope for a membership digest
      // (the id canon carries no floats; float rendering isn't
      // cross-engine portable — the table_fingerprint caveat).
      // entry carries ITS embedding too — hop 0 (scoring the entry point)
      // must not touch the corpus either
      val entry = promoted.agg(min(col("vec_id")).as("entry"))
        .join(dstEmb.select(col("dst").as("entry"),
          col("dst_emb").as("entry_emb")), Seq("entry"))
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
    layout(spark, sfDir)
    searchIn(spark, edgesPath(sfDir), metaPath(sfDir), queries, k)
  }

  /** Search a caller-owned graph directory (a clone mutated by the
    * maintenance verbs [[appendToGraph]]/[[deleteFromGraph]]) — resolves
    * the base + delta + tombstone state through [[readGraph]].
    */
  def searchIn(spark: SparkSession, edgesDir: String, metaDir: String,
               queries: DataFrame, k: Int): DataFrame = {
    val (beam, _) = walkGraph(spark, edgesDir, metaDir, queries)
    beam.withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
  }

  private def wBeam = Window.partitionBy(col("qid"))
    .orderBy(col("sim").desc, col("vec_id").asc)

  /** Scan leaves of each hop's physical plan from the most recent
    * [[walk]] — HnswSpec asserts every file scan on the serving path
    * reads the graph artifact (edges/meta), never the embeddings corpus:
    * the structural proof that per-hop I/O is bounded by the beam × the
    * probed src buckets, not by corpus size.
    */
  @volatile private[graft] var lastWalkScans: Seq[Seq[String]] = Nil

  /** The one beam walk both serving faces share: fixed [[Schedule]],
    * per-qid beams, each hop localCheckpointed. Hop 0 scores the global
    * entry point from the meta-carried `entry_emb`; every later hop
    * scores neighbors from the adjacency-carried `dst_emb` (the DiskANN
    * layout) — the corpus table is never opened. Returns the final beam
    * (qid, vec_id, sim) and the VISITED candidate pool (qid, vec_id,
    * sim — every id any hop scored, entry included, sims attached) so
    * the filtered face can rank a predicate subset without a second walk
    * OR a corpus rescan. One definition: a schedule/tie-break/checkpoint
    * change cannot desync the two oracled query families.
    */
  /** One hop of the beam walk: neighbor expansion + scoring in ONE probe
    * of the src-clustered adjacency — `dst_emb` rides the matched edge
    * rows, so the join output is already scorable (Ef·MaxDegree rows,
    * corpus untouched). Beam members keep their already-computed sims
    * (deterministic round-6 cosine of the same arrays — re-scoring would
    * be a no-op). Returns (candidate pool of the hop, next beam). ONE
    * definition shared by the fixed-schedule walk and the adaptive
    * search so the two serving faces cannot desync.
    */
  private def hopOnce(edges: DataFrame, qs: DataFrame, beam: DataFrame,
                      layer: Int): (DataFrame, DataFrame) = {
    val nbrs = edges.filter(col("layer") === layer)
      .join(broadcast(beam.select(col("qid"), col("vec_id").as("src"))), Seq("src"))
      .join(broadcast(qs), Seq("qid"))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col("dst_emb"), col("q_emb")), 6))
      .select(col("qid"), col("dst").as("vec_id"), col("sim"))
    val cands = beam.select(col("qid"), col("vec_id"), col("sim"))
      .union(nbrs).distinct()
    val next = cands
      .withColumn("__rn", row_number().over(wBeam))
      .filter(col("__rn") <= Ef)
      .select(col("qid"), col("vec_id"), col("sim"))
    (cands, next)
  }

  /** The shared hop-0: score the global entry point from the
    * meta-carried `entry_emb` (no corpus lookup).
    */
  private def entryBeam(qs: DataFrame, meta: DataFrame): DataFrame =
    qs.crossJoin(broadcast(meta.select(col("entry").as("vec_id"), col("entry_emb"))))
      .withColumn("sim",
        round(GraftFunctions.cosineSim(col("entry_emb"), col("q_emb")), 6))
      .select(col("qid"), col("vec_id"), col("sim"))

  private def walkGraph(spark: SparkSession, edgesDir: String, metaDir: String,
                        queries: DataFrame): (DataFrame, DataFrame) = {
    GraftFunctions.register(spark)
    val edges = readGraph(spark, edgesDir)
    val meta = spark.read.parquet(metaDir)
    val scans = Seq.newBuilder[Seq[String]]
    def leaves(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collectLeaves().map(_.toString).toSeq
    // pin the query batch ONCE: each hop re-joins it for q_emb, and
    // without the checkpoint every hop would re-open the caller's source
    val qs = queries.localCheckpoint()
    // a tombstoned entry (deleted after this meta was written, before
    // deleteFromGraph's re-election ran — or a hand-mutated clone) must
    // never be SERVED: readGraph drops tombstoned dsts, and this drops
    // the one id that enters the beam from meta instead of an edge
    var beam =
      if (dirExists(spark, tombstonesPath(edgesDir)))
        entryBeam(qs, meta).join(
          broadcast(spark.read.parquet(tombstonesPath(edgesDir))),
          Seq("vec_id"), "left_anti")
      else entryBeam(qs, meta)
    scans += leaves(beam)
    beam = beam.localCheckpoint()
    var visited = beam
    for (layer <- Schedule) {
      val (cands, hop) = hopOnce(edges, qs, beam, layer)
      visited = visited.union(cands)
      scans += leaves(hop)
      beam = hop.localCheckpoint() // pin each hop: the next hop re-joins this tiny frame twice
    }
    lastWalkScans = scans.result()
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
    layout(spark, sfDir)
    val (_, visited) = walkGraph(spark, edgesPath(sfDir), metaPath(sfDir), queries)
    // the visited pool already carries every candidate's sim (scored at
    // the hop that first reached it), so the filtered rank is a pure
    // re-sort of the pool's matching subset — no corpus rescan, no
    // second scoring pass. `pred` ranges over (qid, vec_id, sim); an
    // attribute predicate joins its own (small) attribute frame first.
    visited.distinct()
      .filter(pred)
      .withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
  }

  // --- adaptive serving ----------------------------------------------------

  /** Caps on the greedy walk — the static unroll depth of the oracle's
    * gated CTE replay. Real HNSW's convergence loop is unbounded; a hard
    * cap keeps serving latency bounded AND the search replayable.
    */
  val HopsL1Max = 4
  val HopsL0Max = 8

  /** Realized-hop dump of the most recent [[searchAdaptive]] — one row
    * (h1, h0) — so the DuckDB oracle unrolls the SAME number of live
    * hops (the rest of its static cap-depth unroll passes the beam
    * through unchanged).
    */
  def adaptPath(sfDir: String): String = edgesPath(sfDir) + "-adapt"

  /** GREEDY beam search (Malkov 2016 §4's convergence loop, bounded):
    * instead of the fixed Schedule, each layer phase hops until the beam
    * reaches a FIXED POINT — membership unchanged — or the layer's cap.
    * Membership fixed-point is sound termination: the beam update is
    * deterministic and monotone in (sim desc, id asc) per slot (the next
    * beam is the top-Ef of a superset of the current beam), so an
    * unchanged beam reproduces itself forever and no oscillation exists.
    * On a 100× corpus (larger graph diameter) the walk self-extends to
    * the cap instead of silently under-reaching like a fixed schedule;
    * on an easy query it stops early. The per-hop convergence check
    * collects the ≤ Ef·|batch|-row beam — driver-side metadata, the
    * LogReg-digest posture. Realized (h1, h0) are dumped so the oracle
    * replays the exact walk: hop i of the static cap-depth unroll is
    * LIVE iff i < h1+h0 (layer 1 if i < h1 else 0) and a pass-through
    * re-rank otherwise — making the adaptive result a pure function of
    * (graph artifact, realized-hop artifact), hash-checkable end to end.
    * Because adaptive hops extend the fixed schedule's prefix at every
    * fixed point (a converged phase re-runs as no-ops), the final beam's
    * sim multiset is ≥ the fixed schedule's — HnswSpec pins that.
    */
  def searchAdaptive(spark: SparkSession, sfDir: String, queries: DataFrame,
                     k: Int): DataFrame = {
    layout(spark, sfDir)
    GraftFunctions.register(spark)
    val edges = readGraph(spark, edgesPath(sfDir))
    val meta = spark.read.parquet(metaPath(sfDir))
    val qs = queries.localCheckpoint()
    var beam = entryBeam(qs, meta).localCheckpoint()
    def members(b: DataFrame): Set[(Long, Long)] =
      b.select(col("qid"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    var cur = members(beam)
    var h1 = 0
    var h0 = 0
    var fixed = false
    while (h1 < HopsL1Max && !fixed) {
      beam = hopOnce(edges, qs, beam, 1)._2.localCheckpoint()
      h1 += 1
      val s = members(beam); fixed = s == cur; cur = s
    }
    fixed = false
    while (h0 < HopsL0Max && !fixed) {
      beam = hopOnce(edges, qs, beam, 0)._2.localCheckpoint()
      h0 += 1
      val s = members(beam); fixed = s == cur; cur = s
    }
    import spark.implicits._
    Seq((h1.toLong, h0.toLong)).toDF("h1", "h0")
      .coalesce(1).write.mode("overwrite").parquet(adaptPath(sfDir))
    beam.withColumn("rnk", row_number().over(wBeam))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rnk"))
  }

  // --- maintenance verbs ---------------------------------------------------
  // The Ivfpq posture: mutations are LOGICAL first (delta + sidecar,
  // O(change) I/O), PHYSICAL later (compactGraph folds them into a new
  // base). Readers resolve base ∪ delta with last-writer-wins per
  // (layer, src) and subtract the tombstone sidecar — both sidecars are
  // maintenance-batch-sized, so the resolution is two broadcast joins.

  /** Per-append delta edge rows (carry an explicit `gen`). */
  def deltaPath(edgesDir: String): String = edgesDir + "-delta"

  /** (layer, src, gen) rows: srcs whose base/older-gen edge lists were
    * superseded by the given gen's delta.
    */
  def replacedPath(edgesDir: String): String = edgesDir + "-replaced"

  /** Logically deleted vec_ids (the Ivfpq tombstone sidecar pattern). */
  def tombstonesPath(edgesDir: String): String = edgesDir + "-tombstones"

  /** Shard-membership sidecar (vec_id, embedding, shard), partitioned by
    * shard — dumped at build so [[appendToGraph]] pairs new nodes against
    * ONLY their touched shards' members (partition-pruned read, cost
    * scales with the change, never the corpus). The second denormalized
    * vector copy the graph trades for change-scaled maintenance.
    */
  def shardsPath(edgesDir: String): String = edgesDir + "-shards"

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Resolve a graph directory to its LIVE adjacency: base ∪ deltas with
    * last-writer-wins per (layer, src) (the `replaced` sidecar names the
    * winning gen), minus edges into tombstoned nodes. With no sidecars
    * (the common, just-built case) this is exactly the base scan.
    */
  def readGraph(spark: SparkSession, edgesDir: String): DataFrame = {
    val base = spark.read.parquet(edgesDir).withColumn("gen", lit(0L))
    val all =
      if (dirExists(spark, deltaPath(edgesDir)))
        base.unionByName(spark.read.parquet(deltaPath(edgesDir)))
      else base
    val resolved =
      if (dirExists(spark, replacedPath(edgesDir))) {
        val latest = spark.read.parquet(replacedPath(edgesDir))
          .groupBy(col("layer"), col("src")).agg(max(col("gen")).as("__latest"))
        all.join(broadcast(latest), Seq("layer", "src"), "left")
          .filter(col("gen") === coalesce(col("__latest"), lit(0L)))
          .drop("__latest")
      } else all
    val live =
      if (dirExists(spark, tombstonesPath(edgesDir)))
        resolved.join(
          broadcast(spark.read.parquet(tombstonesPath(edgesDir))
            .select(col("vec_id").as("dst"))), Seq("dst"), "left_anti")
      else resolved
    live.select(col("layer"), col("src"), col("dst"), col("dst_emb"))
  }

  private val FpMod = 2305843009213693951L // 2^61 − 1, the membership-fp modulus

  /** APPEND new vectors ((vec_id, embedding) rows, ids disjoint from the
    * graph) to a caller-owned graph clone WITHOUT a rebuild: assign each
    * new node to its 2 nearest FROZEN trained cells (the build's shard
    * recipe against the sfDir's dumped KMeans geometry), pair it only
    * against those shards' members (partition-pruned via the shards
    * sidecar — O(|change| · |shard|) work), keep its top-M out-edges per
    * layer, and re-cap the edge lists of the touched in-link targets at
    * MaxDegree. Writes ONE delta file set + O(touched)-row sidecar
    * entries; the meta fingerprint updates ADDITIVELY (the fp is a sum
    * mod 2^61−1, so an append needs only the delta digest — no corpus
    * pass). Entry re-election if a promoted new id undercuts it.
    */
  def appendToGraph(spark: SparkSession, sfDir: String, edgesDir: String,
                    metaDir: String, newVecs: DataFrame): Unit = {
    GraftFunctions.register(spark)
    val cents = Ann.kmeansLayout(spark, sfDir)._2
    val newShards = Ann.nearestCells(
        newVecs.select(col("vec_id"), col("embedding")),
        Ann.centroidsDf(spark, cents), "vec_id", "embedding", n = 2)
      .select(col("vec_id"), col("embedding"), col("cell").as("shard"))
      .localCheckpoint()
    val touched = newShards.select(col("shard")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val members = spark.read.parquet(shardsPath(edgesDir))
      .filter(col("shard").isin(touched: _*))
      .unionByName(newShards)
      .localCheckpoint()
    val newIds = newShards.select(col("vec_id")).distinct().localCheckpoint()
    val gen = (if (dirExists(spark, replacedPath(edgesDir)))
      spark.read.parquet(replacedPath(edgesDir))
        .agg(max(col("gen"))).head().getLong(0)
    else 0L) + 1L
    val promotedPred =
      pmod(graft.functions.Digests.digest60(col("vec_id").cast("string")),
        lit(LayerMod)) === 0
    def layerDelta(layer: Int): DataFrame = {
      val news = if (layer == 1) newShards.filter(promotedPred) else newShards
      val mems = if (layer == 1) members.filter(promotedPred) else members
      // new-node out-edges: top-M within the touched shards
      val pairs = news
        .select(col("shard"), col("vec_id").as("src"), col("embedding").as("ea"))
        .join(mems.select(col("shard"), col("vec_id").as("dst"),
          col("embedding").as("dst_emb")), Seq("shard"))
        .filter(col("src") =!= col("dst"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("ea"), col("dst_emb")), 6))
        .groupBy(col("src"), col("dst"))
        .agg(max(col("sim")).as("sim"), first(col("dst_emb")).as("dst_emb"))
      val wSrc = Window.partitionBy(col("src"))
        .orderBy(col("sim").desc, col("dst").asc)
      val newOut = pairs.withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= M)
        .select(col("src"), col("dst"), col("sim"), col("dst_emb"))
        .localCheckpoint()
      // navigability: the in-link targets (existing nodes a new node now
      // points at) take the reverse edge and re-cap at MaxDegree —
      // their current sims recompute from the member/new embeddings
      val touchedDst = newOut
        .join(newIds.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
        .select(col("dst").as("src")).distinct()
      val srcEmb = members.select(col("vec_id").as("src"),
        col("embedding").as("__se")).dropDuplicates("src")
      val rev = newOut
        .join(newShards.select(col("vec_id").as("src"),
          col("embedding").as("__ne")).dropDuplicates("src"), Seq("src"))
        .select(col("dst").as("src"), col("src").as("dst"),
          col("sim"), col("__ne").as("dst_emb"))
        .join(newIds.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      val baseRows = spark.read.parquet(edgesDir).withColumn("gen", lit(0L))
      val allRows =
        if (dirExists(spark, deltaPath(edgesDir)))
          baseRows.unionByName(spark.read.parquet(deltaPath(edgesDir)))
        else baseRows
      val oldRows = allRows
        .filter(col("layer") === layer)
        .join(broadcast(touchedDst), Seq("src"), "left_semi")
      val oldLatest =
        if (dirExists(spark, replacedPath(edgesDir))) {
          val latest = spark.read.parquet(replacedPath(edgesDir))
            .filter(col("layer") === layer)
            .groupBy(col("src")).agg(max(col("gen")).as("__latest"))
          oldRows.join(broadcast(latest), Seq("src"), "left")
            .filter(col("gen") === coalesce(col("__latest"), lit(0L)))
            .drop("__latest")
        } else oldRows.filter(col("gen") === 0L)
      val recapped = oldLatest
        .join(srcEmb, Seq("src"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("__se"), col("dst_emb")), 6))
        .select(col("src"), col("dst"), col("sim"), col("dst_emb"))
        .unionByName(rev)
        .groupBy(col("src"), col("dst"))
        .agg(max(col("sim")).as("sim"), first(col("dst_emb")).as("dst_emb"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= MaxDegree)
        .select(col("src"), col("dst"), col("sim"), col("dst_emb"))
      newOut.unionByName(recapped)
        .select(lit(layer).as("layer"), col("src"), col("dst"),
          col("dst_emb"), lit(gen).as("gen"))
    }
    val delta = layerDelta(0).unionByName(layerDelta(1)).localCheckpoint()
    delta.write.mode("append").parquet(deltaPath(edgesDir))
    delta.select(col("layer"), col("src")).distinct()
      .withColumn("gen", lit(gen))
      .write.mode("append").parquet(replacedPath(edgesDir))
    newShards.write.mode("append").partitionBy("shard")
      .parquet(shardsPath(edgesDir))
    // incremental meta: additive fp, count, entry re-election
    val old = spark.read.parquet(metaDir).head()
    val deltaFp = graft.streaming.Streaming.fingerprintStream(
      newIds, col("vec_id").cast("string")).head()
    val newFp = ((old.getAs[Long]("corpus_fp") + deltaFp.getLong(1)) % FpMod + FpMod) % FpMod
    val newN = old.getAs[Long]("corpus_n") + deltaFp.getLong(0)
    val promotedNew = newShards.filter(promotedPred)
      .agg(min(col("vec_id"))).head()
    val oldEntry = old.getAs[Long]("entry")
    val meta =
      if (!promotedNew.isNullAt(0) && promotedNew.getLong(0) < oldEntry) {
        val e = promotedNew.getLong(0)
        newShards.filter(col("vec_id") === e)
          .select(col("vec_id").as("entry"), col("embedding").as("entry_emb"))
          .limit(1)
          .withColumn("corpus_n", lit(newN)).withColumn("corpus_fp", lit(newFp))
      } else {
        spark.read.parquet(metaDir)
          .select(col("entry"), col("entry_emb"))
          .withColumn("corpus_n", lit(newN)).withColumn("corpus_fp", lit(newFp))
      }
    val pinned = meta.localCheckpoint()
    pinned.coalesce(1).write.mode("overwrite").parquet(metaDir)
  }

  /** Logical DELETE: append the ids to the tombstone sidecar (KBs per
    * maintenance batch) and retire them from the meta fingerprint —
    * served as exclusions by [[readGraph]] on the very next search, made
    * physical by [[compactGraph]]. IDEMPOTENT and validated: duplicate
    * ids, already-tombstoned ids, and non-member ids are dropped BEFORE
    * the fingerprint subtraction (at-least-once delivery — the streaming
    * face's foreachBatch — must not corrupt the meta), and deleting the
    * current entry point re-elects one from the live membership so the
    * very next search still navigates.
    */
  def deleteFromGraph(spark: SparkSession, edgesDir: String, metaDir: String,
                      ids: Seq[Long]): Unit = {
    import spark.implicits._
    val already: Set[Long] =
      if (dirExists(spark, tombstonesPath(edgesDir)))
        spark.read.parquet(tombstonesPath(edgesDir))
          .collect().map(_.getLong(0)).toSet
      else Set.empty
    // membership check against the shards sidecar: a non-member id must
    // not subtract from the fp (point lookup, maintenance-batch-sized)
    val candidates = ids.distinct.filterNot(already)
    val members: Set[Long] =
      if (candidates.isEmpty) Set.empty
      else spark.read.parquet(shardsPath(edgesDir))
        .filter(col("vec_id").isin(candidates: _*))
        .select(col("vec_id")).distinct()
        .collect().map(_.getLong(0)).toSet
    val fresh = candidates.filter(members)
    if (fresh.isEmpty) return
    fresh.toDF("vec_id").write.mode("append").parquet(tombstonesPath(edgesDir))
    val old = spark.read.parquet(metaDir).head()
    // the SAME engine digest the build's fingerprint used — additive mod
    // 2^61−1, so retiring ids is a subtraction of the batch digest
    val delFp = graft.streaming.Streaming.fingerprintStream(
      fresh.toDF("vec_id"), col("vec_id").cast("string")).head().getLong(1)
    val newFp = ((old.getAs[Long]("corpus_fp") - delFp) % FpMod + FpMod) % FpMod
    val newN = old.getAs[Long]("corpus_n") - fresh.length
    val meta =
      if (fresh.contains(old.getAs[Long]("entry")))
        // the entry died: re-elect from the live membership now, not at
        // compaction — a beam must start somewhere on the next search
        electEntry(spark, edgesDir, already ++ fresh)
          .withColumn("corpus_n", lit(newN)).withColumn("corpus_fp", lit(newFp))
          .localCheckpoint()
      else
        spark.read.parquet(metaDir)
          .select(col("entry"), col("entry_emb"))
          .withColumn("corpus_n", lit(newN)).withColumn("corpus_fp", lit(newFp))
          .localCheckpoint()
    meta.coalesce(1).write.mode("overwrite").parquet(metaDir)
  }

  /** Elect an entry point from the live (non-tombstoned) shard members:
    * the min-id PROMOTED node (the build's rule), falling back to the
    * min-id live node when every promoted node is gone (layer-1 hops
    * from a non-promoted entry are no-ops; layer 0 still navigates).
    * Refuses an empty graph loudly instead of writing a 0-row meta.
    */
  private def electEntry(spark: SparkSession, edgesDir: String,
                         dead: Set[Long]): DataFrame = {
    val promotedPred =
      pmod(graft.functions.Digests.digest60(col("vec_id").cast("string")),
        lit(LayerMod)) === 0
    val live = spark.read.parquet(shardsPath(edgesDir))
      .filter(if (dead.isEmpty) lit(true) else !col("vec_id").isin(dead.toSeq: _*))
    val pick = live
      .orderBy(promotedPred.cast("int").desc, col("vec_id").asc)
      .limit(1)
      .select(col("vec_id").as("entry"), col("embedding").as("entry_emb"))
      .localCheckpoint()
    require(pick.count() > 0,
      s"hnsw: cannot elect an entry — no live nodes remain in $edgesDir")
    pick
  }

  /** PHYSICAL repair: fold base + deltas − tombstones into a fresh base,
    * drop tombstoned members from the shards sidecar, re-elect the entry
    * if it was deleted, clear every sidecar. After compaction the graph
    * reads exactly like a fresh build.
    */
  def compactGraph(spark: SparkSession, edgesDir: String, metaDir: String): Unit = {
    val tombed =
      if (dirExists(spark, tombstonesPath(edgesDir)))
        spark.read.parquet(tombstonesPath(edgesDir)).distinct().localCheckpoint()
      else spark.range(0).select(col("id").as("vec_id"))
    val live = readGraph(spark, edgesDir)
      // tombstoned SRCs vanish too (readGraph only subtracts dsts — a
      // deleted node must stop routing once its rows are rewritten)
      .join(broadcast(tombed.select(col("vec_id").as("src"))), Seq("src"), "left_anti")
      .select(col("layer"), col("src"), col("dst"), col("dst_emb"))
      .localCheckpoint()
    live.repartition(col("src")).write.mode("overwrite").parquet(edgesDir)
    val shards = spark.read.parquet(shardsPath(edgesDir))
      .join(broadcast(tombed), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    shards.write.mode("overwrite").partitionBy("shard").parquet(shardsPath(edgesDir))
    val old = spark.read.parquet(metaDir).head()
    if (tombed.filter(col("vec_id") === old.getAs[Long]("entry")).count() > 0) {
      // shards were already rewritten minus the tombstones above, so the
      // election pool is exactly the live membership; electEntry prefers
      // a promoted node, falls back to any live node, and refuses an
      // empty graph instead of clobbering the meta with a 0-row table
      val meta = electEntry(spark, edgesDir, Set.empty)
        .withColumn("corpus_n", lit(old.getAs[Long]("corpus_n")))
        .withColumn("corpus_fp", lit(old.getAs[Long]("corpus_fp")))
        .localCheckpoint()
      meta.coalesce(1).write.mode("overwrite").parquet(metaDir)
    }
    val conf = spark.sessionState.newHadoopConf()
    Seq(deltaPath(edgesDir), replacedPath(edgesDir), tombstonesPath(edgesDir))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
  }

  /** The maintenance demo's appended node id — far above every corpus id. */
  val AppendedId = 900001L

  /** Canonical locations of the maintenance demo clone — pure path
    * arithmetic shared with Verify's pathSubs (a suffix rename cannot
    * silently leave the oracle globbing stale directories).
    */
  def maintDemoEdgesPath(sfDir: String): String = edgesPath(sfDir) + "-maint-demo"
  def maintDemoMetaPath(sfDir: String): String = maintDemoEdgesPath(sfDir) + "-meta"

  private val demoMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** One-time staged maintenance demo (the Ivfpq deletedDemoLayout
    * posture — the MUTATION is the stage, queries measure the SEARCH):
    * clone the sfDir base graph, APPEND one synthetic node — id
    * [[AppendedId]], the re-normalized mean of corpus vectors 5 and 9,
    * deterministic and distinct from every corpus vector — then DELETE
    * the base graph's top-1 neighbor of query 0. The oracled
    * `ann_hnsw_appended`/`ann_hnsw_deleted` queries serve this
    * UNCOMPACTED state (base + delta + replaced + tombstone sidecars),
    * so the merge-on-read resolution itself is hash-checked
    * cross-engine. Returns (edgesDir, metaDir).
    */
  def maintDemoLayout(spark: SparkSession, sfDir: String): (String, String) =
    demoMemo.computeIfAbsent(sfDir, { _ =>
      layout(spark, sfDir)
      val de = maintDemoEdgesPath(sfDir)
      val dm = maintDemoMetaPath(sfDir)
      val conf = spark.sessionState.newHadoopConf()
      Seq(deltaPath(de), replacedPath(de), tombstonesPath(de)).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).delete(p, true)
      }
      spark.read.parquet(edgesPath(sfDir))
        .write.mode("overwrite").parquet(de)
      spark.read.parquet(shardsPath(edgesPath(sfDir)))
        .write.mode("overwrite").partitionBy("shard").parquet(shardsPath(de))
      val m0 = spark.read.parquet(metaPath(sfDir)).localCheckpoint()
      m0.coalesce(1).write.mode("overwrite").parquet(dm)
      val emb = graft.Tables.embeddings(spark, sfDir)
      val nv = emb.filter(col("vec_id") === 5).select(col("embedding").as("__ea"))
        .crossJoin(emb.filter(col("vec_id") === 9).select(col("embedding").as("__eb")))
        .select(lit(AppendedId).as("vec_id"),
          graft.functions.VectorOps.l2Normalize(
            zip_with(col("__ea"), col("__eb"),
              (x, y) => (x + y) / lit(2.0))).cast("array<float>").as("embedding"))
      appendToGraph(spark, sfDir, de, dm, nv)
      // delete the (pre-delete) top-1 neighbor of corpus query 0 —
      // chosen by the search itself, replayed from the dumped sidecar
      val q0 = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val top1 = searchIn(spark, de, dm, q0, k = 1).head().getLong(1)
      deleteFromGraph(spark, de, dm, Seq(top1))
      (de, dm)
    })

  private[graft] def resetMemos(): Unit = { memo.clear(); demoMemo.clear() }
}
