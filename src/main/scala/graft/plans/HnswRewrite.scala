package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, AttributeReference, Descending, EqualTo, Expression, In, InSet, IsNotNull, Literal, Not, Round, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Sort, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.expressions.CosineSimilarity

/** Transparent GRAPH ANN: the HNSW sibling of [[IvfTopKRewrite]]. A user
  * writes the exact top-k —
  * `ORDER BY round(cosine_sim(embedding, <literal query vector>), 6) DESC
  * [, id ASC] LIMIT k` — against a registered corpus table, and this rule
  * serves the candidate set from the strictly-better graph index
  * (HnswSpec: higher recall than IVF at a smaller scored budget) instead
  * of a full scan.
  *
  * Mechanics differ from the IVF rule only in what the "index probe" is:
  * IVF's probe is driver arithmetic over broadcast centroids and injects
  * `Filter(cell = best)` (partition pruning); a graph probe IS the
  * bounded beam walk — ≤ schedule·Ef·(MaxDegree+1) scored rows over
  * bucket-pruned artifact files, executed AT REWRITE TIME as the index
  * lookup (the same acceptable class: the walk reads index artifacts,
  * never the corpus, and its result is ≤ Ef ids of driver metadata) —
  * and injects `Filter(id IN (<final beam>))` above the scan. The FULL
  * final beam (Ef ids) is injected, not just k of them: the user's own
  * sort exact-rescores those rows, and since the walk already ranks by
  * the exact rounded cosine, the top-k of the rescored beam IS the
  * graph's top-k — while the extra Ef−k ids give benign id exclusions
  * headroom to drop a few rows without starving the LIMIT.
  *
  * Firing guards (each falls through to the untouched exact plan):
  *  - k ≤ Ef — a LIMIT beyond the beam width cannot be served from one
  *    walk and must NOT silently truncate;
  *  - the ranking must BE the walk's ranking: `round(sim, 6)` descending
  *    (the walk scores exactly that — a coarser/finer rounding or the
  *    raw cosine resolves round-6 ties differently over the full corpus
  *    than over 16 beam ids), with either no further sort key or the
  *    registered id ascending (the walk's own tiebreak);
  *  - the cosine's column attribute must BE the registered embedding
  *    column of the registered relation — a second vector column on the
  *    same table ranks differently and must scan exactly;
  *  - the plan between the sort and the scan is a pure Project/Filter
  *    spine — a join, aggregate, sample, or distinct shapes the row set
  *    in ways an injected id set cannot account for;
  *  - every predicate conjunct on that spine is a PROVABLY benign id
  *    exclusion — `id <> <literal>` or `IS NOT NULL(id)` — and the
  *    exclusion count e keeps k + e ≤ Ef: the unfiltered top-(k+e) (⊆
  *    the beam) then provably contains the filtered top-k. An id RANGE
  *    (`id >= 400`) is NOT benign — the unfiltered beam need not
  *    intersect it at all — and is the explicit filtered face's job
  *    (Hnsw.searchFiltered, the ACORN pool), not a rewrite's.
  *
  * Approximate by construction, so strictly opt-in (register), memoized
  * per (graph, generation, query vector, k) — maintenance verbs bump the
  * generation, so an in-flight pre-mutation walk can only ever populate
  * the OLD generation's slot and a mutated index never serves a
  * pre-mutation candidate set — the walk runs OUTSIDE any map lock and a
  * probe failure (mis-registered dirs, deleted artifacts) logs and falls
  * through to the exact scan instead of failing the user's query.
  */
object HnswGraphRegistry {

  /** One registered graph index over a corpus table path: the id and
    * embedding column names of the indexed table and the graph dirs
    * (canonicalized, so maintenance-side invalidation keys always match).
    */
  final case class Entry(idCol: String, embCol: String, edgesDir: String,
                         metaDir: String)

  private val registry = new ConcurrentHashMap[String, Entry]()
  private val probeMemo =
    new ConcurrentHashMap[(String, Long, Seq[Double], Int), Seq[Long]]()
  private val generation = new ConcurrentHashMap[String, java.lang.Long]()

  private def canon(path: String): String = RewriteSupport.canon(path)

  def register(corpusPath: String, idCol: String, embCol: String,
               edgesDir: String, metaDir: String): Unit =
    registry.put(canon(corpusPath),
      Entry(idCol, embCol, canon(edgesDir), metaDir))

  def lookup(rootPaths: Seq[String]): Option[Entry] =
    rootPaths.iterator.map(p => Option(registry.get(canon(p))))
      .collectFirst { case Some(e) => e }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = {
    registry.clear(); probeMemo.clear(); generation.clear()
  }

  /** Invalidate memoized probes for a graph whose artifact just mutated —
    * called by Hnsw.appendToGraph/deleteFromGraph/compactGraph. Bumping
    * the GENERATION (not just purging) closes the check-then-act race: a
    * walk that started before the mutation can only insert under the old
    * generation's key, which no post-mutation lookup ever reads. The old
    * entries are purged too (they are driver metadata, but no reason to
    * keep them).
    */
  def invalidate(edgesDir: String): Unit = {
    val dir = canon(edgesDir)
    generation.merge(dir, 1L, (a, b) => a + b)
    val it = probeMemo.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
  }

  private def generationOf(edgesDir: String): Long =
    Option(generation.get(edgesDir)).map(_.longValue).getOrElse(0L)

  /** The graph-index probe: run the bounded beam walk for the literal
    * query vector, return the FULL final beam's ids (≤ Ef, rnk order).
    * Memoized per (graph, generation, qVec, Ef) — the optimizer may
    * visit the same plan more than once (fixed-point batches, AQE
    * re-planning) and the walk is a pure function of (graph, qVec)
    * within a generation. The walk itself runs OUTSIDE the map (a
    * seconds-long Spark job must not hold a ConcurrentHashMap bin lock
    * against concurrent planning threads); a racing duplicate walk is
    * idempotent and putIfAbsent keeps one result.
    */
  def beamIds(spark: SparkSession, e: Entry, qVec: Array[Double]): Seq[Long] = {
    val key = (e.edgesDir, generationOf(e.edgesDir), qVec.toSeq,
      graft.operators.Hnsw.Ef)
    Option(probeMemo.get(key)).getOrElse {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val qdf = Seq((0L, qVec.toSeq)).toDF("qid", "q_emb")
        .select(col("qid"), col("q_emb").cast("array<float>").as("q_emb"))
      val walked = graft.operators.Hnsw.searchIn(spark, e.edgesDir, e.metaDir,
          qdf, k = graft.operators.Hnsw.Ef)
        .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
      probeMemo.putIfAbsent(key, walked)
      walked
    }
  }
}

/** The rewrite rule (injected via GraftExtensions.injectOptimizerRule). */
case class HnswTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (HnswGraphRegistry.isEmpty) return plan
    plan.transformDown {
      case limit @ Limit(le @ Literal(k: Int, IntegerType),
          sort @ Sort(SortOrder(ref: AttributeReference, Descending, _, _) +: tail, true, child, _))
          if k <= graft.operators.Hnsw.Ef =>
        tryRewrite(ref, tail, k, child) match {
          // Rebuild via Limit.apply — the extractor matched
          // GlobalLimit(LocalLimit(sort)); see IvfTopKRewrite for why
          // withNewChildren on the outer node alone would be wrong.
          case Some(newChild) => Limit(le, sort.withNewChildren(Seq(newChild)))
          case None => limit
        }
    }
  }

  /** sim expression behind the sort attribute: require the WALK'S OWN
    * ranking form — `round(cosine_sim(<column>, <literal vector>), 6)`
    * (either argument order). A different rounding scale (or the raw
    * cosine) resolves round-6 ties differently over the full corpus than
    * over the 16-id beam, so anything else falls through.
    */
  private def simQueryVector(e: Expression): Option[(AttributeReference, Array[Double])] = e match {
    case r: Round => r.scale match {
      case Literal(6, IntegerType) => r.child match {
        case CosineSimilarity(a: AttributeReference, l: Literal) =>
          RewriteSupport.literalVec(l).map((a, _))
        case CosineSimilarity(l: Literal, a: AttributeReference) =>
          RewriteSupport.literalVec(l).map((a, _))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** The plan between the sort and the scan must be a pure
    * Project/Filter spine ending at THE registered relation — any other
    * operator (join, aggregate, sample, distinct, set op) shapes the row
    * set in ways the injected id set cannot account for.
    */
  private def pureSpine(p: LogicalPlan): Boolean = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    p match {
      case _: LogicalRelation => true
      case pr: Project => pureSpine(pr.child)
      case f: Filter => pureSpine(f.child)
      case _ => false
    }
  }

  /** Some(#distinct excluded ids) iff EVERY conjunct of every Filter on
    * the spine is a provably benign id exclusion: `NOT (id = <literal>)`
    * or `IS NOT NULL(id)` (matched by exprId against the registered
    * relation's id attribute, so an identically-named column from
    * elsewhere can never pass). Anything else — ranges, IN lists,
    * non-id references — returns None and the rewrite falls through.
    */
  private def benignExclusions(conds: Seq[Expression],
                               idAttr: AttributeReference): Option[Int] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val excluded = scala.collection.mutable.Set[Any]()
    val ok = conds.flatMap(conjuncts).forall {
      case Not(EqualTo(a: AttributeReference, l: Literal))
        if a.exprId == idAttr.exprId => excluded += l.value; true
      case Not(EqualTo(l: Literal, a: AttributeReference))
        if a.exprId == idAttr.exprId => excluded += l.value; true
      case IsNotNull(a: AttributeReference)
        if a.exprId == idAttr.exprId => true
      case _ => false
    }
    if (ok) Some(excluded.size) else None
  }

  private def tryRewrite(ref: AttributeReference, sortTail: Seq[SortOrder],
                         k: Int, child: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val simExpr = child.collect { case p: Project => p.projectList }.flatten
      .collectFirst { case a: Alias if a.exprId == ref.exprId => a.child }
    for {
      (simAttr, qVec) <- simExpr.flatMap(simQueryVector)
      if pureSpine(child)
      rel <- child.collectFirst {
        case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if HnswGraphRegistry.lookup(fs.location.rootPaths.map(_.toString)).isDefined => r
      }
      entry <- HnswGraphRegistry.lookup(
        rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString))
      idAttr <- rel.output.find(_.name == entry.idCol)
      // any trailing sort key must be the walk's own tiebreak: the
      // registered id, ascending — a different secondary key resolves
      // sim ties over the full corpus, which 16 beam ids cannot replay
      if sortTail.isEmpty || (sortTail match {
        case Seq(SortOrder(a: AttributeReference, Ascending, _, _)) =>
          a.exprId == idAttr.exprId
        case _ => false
      })
      // the ranked column must BE the indexed embedding column — another
      // vector column on the same table ranks differently (wrong-index
      // hijack) and must keep its exact scan
      if rel.output.exists(o => o.exprId == simAttr.exprId && o.name == entry.embCol)
      // idempotence under the fixed-point optimizer batch: fire once
      if !child.exists {
        case f: Filter => f.condition.exists {
          case In(a: AttributeReference, _) => a.exprId == idAttr.exprId
          case InSet(a: AttributeReference, _) => a.exprId == idAttr.exprId
          case _ => false
        }
        case _ => false
      }
      // user predicates: provably benign id exclusions only, with enough
      // beam headroom that the filtered top-k is still inside it
      exCount <- benignExclusions(
        child.collect { case f: Filter => f.condition }, idAttr)
      if k + exCount <= graft.operators.Hnsw.Ef
      // the probe itself: a mis-registered or since-deleted artifact must
      // fail the REWRITE (fall through to the exact scan), never the
      // user's query; an empty beam (nothing to inject) falls through too
      ids <- try {
        val b = HnswGraphRegistry.beamIds(spark, entry, qVec)
        if (b.nonEmpty) Some(b) else None
      } catch {
        case scala.util.control.NonFatal(ex) =>
          logWarning(s"HnswTopKRewrite: graph probe failed for " +
            s"${entry.edgesDir} — serving the exact scan", ex)
          None
      }
    } yield {
      logInfo(s"HnswTopKRewrite: pruning ${rel.simpleString(50)} to " +
        s"${entry.idCol} IN (${ids.length} graph-served ids)")
      child.transformUp {
        case r: LogicalRelation if r eq rel =>
          Filter(In(idAttr, ids.map(Literal(_))), r)
      }
    }
  }
}
