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
  * Metadata-only cost: the graph row reads its 1-row meta + the sidecar
  * debt counters (the maintenancePlan aggregate), the MV row counts its
  * groups-sized summary and recomputes the source fingerprint (the
  * refresh probe's own check), and a staleness-armed IVF row recomputes
  * the (id, cell) membership digest — one map-side-combined pass, plus a
  * cells-sized count aggregate when a splitCap is armed.
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
      // path); else an armed splitCap with an over-cap hottest cell →
      // split; else serve. A registration without captured staleness
      // metadata (fingerprint "") reads serve, as before.
      val decision =
        if (e.fingerprint.isEmpty || e.idCol.isEmpty) "serve"
        else if (IvfIndexRegistry.tableFingerprint(spark, path,
            Seq(e.idCol.get, e.cellCol)) != e.fingerprint) "rebuild"
        else e.splitCap match {
          case Some(cap) =>
            import org.apache.spark.sql.functions.{count, lit, max}
            val hottest = spark.read.parquet(path)
              .groupBy(col(e.cellCol)).agg(count(lit(1)).as("n"))
              .agg(max(col("n"))).head().getLong(0)
            if (hottest > cap) "split" else "serve"
          case None => "serve"
        }
      ("ivf", path, path, s"cell=${e.cellCol}", e.medoids.size.toLong,
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
  def maintainAll(spark: SparkSession): DataFrame = {
    import spark.implicits._
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
    rows.toSeq.toDF("kind", "table_path", "decision", "action")
      .orderBy(col("kind"), col("table_path"))
  }

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
        val tag = j.right.getTagValue(RewriteSupport.InjectedMarker)
        def named(n: String) = j.right.output.exists(_.name == n)
        def graphServed(mk: String): Unit =
          servedRel(j, ps => HnswGraphRegistry.lookup(ps).map(_.idCol))
            .flatMap(r => HnswGraphRegistry.lookup(rootPaths(r)))
            .foreach { e => tags += s"$mk:${e.edgesDir}"; batchServed += e.edgesDir }
        if (tag.contains("hnsw-batch") || (tag.isEmpty && named("__graft_qid")))
          graphServed("hnsw-batch")
        else if (tag.contains("hnsw-range-batch") || (tag.isEmpty && named("__graft_rqid")))
          graphServed("hnsw-range-batch")
        else if (tag.contains("ivf-batch") || (tag.isEmpty && named("__graft_cell")))
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
