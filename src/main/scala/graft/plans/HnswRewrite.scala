package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Descending, Expression, In, InSet, Literal, Round, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Sort, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}

import graft.expressions.CosineSimilarity

/** Transparent GRAPH ANN: the HNSW sibling of [[IvfTopKRewrite]]. A user
  * writes the exact top-k —
  * `ORDER BY cosine_sim(embedding, <literal query vector>) DESC LIMIT k` —
  * against a registered corpus table, and this rule serves the candidate
  * set from the strictly-better graph index (HnswSpec: higher recall than
  * IVF at a smaller scored budget) instead of a full scan.
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
  * graph's top-k — while the extra Ef−k ids give benign predicates
  * headroom to drop a few rows without starving the LIMIT.
  *
  * Firing guards (all fall through to the untouched exact plan):
  *  - k ≤ Ef — a LIMIT beyond the beam width cannot be served from one
  *    walk and must NOT silently truncate;
  *  - the cosine's column attribute must BE the registered embedding
  *    column of the registered relation — a second vector column on the
  *    same table ranks differently and must scan exactly;
  *  - any Filter between the sort and the scan may reference ONLY the id
  *    column (e.g. `id <> 0`, an id range): such predicates compose with
  *    the injected id set; an arbitrary attribute predicate changes
  *    which ids the TRUE top-k holds, and that is the explicit filtered
  *    face's job (Hnsw.searchFiltered, the ACORN pool), not a rewrite's.
  *
  * Approximate by construction, so strictly opt-in (register), memoized
  * per (graph, query vector, k) — invalidated by the graph maintenance
  * verbs, so a mutated index can never serve a pre-mutation candidate
  * set — idempotent under the fixed-point optimizer batch (the In-filter
  * guard), and falls through untouched for unregistered tables.
  */
object HnswGraphRegistry {

  /** One registered graph index over a corpus table path: the id and
    * embedding column names of the indexed table and the graph dirs.
    */
  final case class Entry(idCol: String, embCol: String, edgesDir: String,
                         metaDir: String)

  private val registry = new ConcurrentHashMap[String, Entry]()
  private val probeMemo =
    new ConcurrentHashMap[(String, Seq[Double], Int), Seq[Long]]()

  private def canon(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  def register(corpusPath: String, idCol: String, embCol: String,
               edgesDir: String, metaDir: String): Unit =
    registry.put(canon(corpusPath), Entry(idCol, embCol, edgesDir, metaDir))

  def lookup(rootPaths: Seq[String]): Option[Entry] =
    rootPaths.iterator.map(p => Option(registry.get(canon(p))))
      .collectFirst { case Some(e) => e }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = { registry.clear(); probeMemo.clear() }

  /** Drop memoized probes for a graph whose artifact just mutated —
    * called by Hnsw.appendToGraph/deleteFromGraph/compactGraph so a
    * repeated (qVec, k) cannot serve tombstone-deleted or pre-append
    * candidates from the cache.
    */
  def invalidate(edgesDir: String): Unit = {
    val it = probeMemo.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == edgesDir) it.remove()
  }

  /** The graph-index probe: run the bounded beam walk for the literal
    * query vector, return the FULL final beam's ids (≤ Ef, rnk order).
    * Memoized — the optimizer may visit the same plan more than once
    * (fixed-point batches, AQE re-planning) and the walk is a pure
    * function of (graph, qVec) between maintenance events.
    */
  def beamIds(spark: SparkSession, e: Entry, qVec: Array[Double]): Seq[Long] =
    probeMemo.computeIfAbsent((e.edgesDir, qVec.toSeq, graft.operators.Hnsw.Ef), { _ =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val qdf = Seq((0L, qVec.toSeq)).toDF("qid", "q_emb")
        .select(col("qid"), col("q_emb").cast("array<float>").as("q_emb"))
      graft.operators.Hnsw.searchIn(spark, e.edgesDir, e.metaDir, qdf,
          k = graft.operators.Hnsw.Ef)
        .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
    })
}

/** The rewrite rule (injected via GraftExtensions.injectOptimizerRule). */
case class HnswTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (HnswGraphRegistry.isEmpty) return plan
    plan.transformDown {
      case limit @ Limit(le @ Literal(k: Int, IntegerType),
          sort @ Sort(SortOrder(ref: AttributeReference, Descending, _, _) +: _, true, child, _))
          if k <= graft.operators.Hnsw.Ef =>
        tryRewrite(ref, child) match {
          // Rebuild via Limit.apply — the extractor matched
          // GlobalLimit(LocalLimit(sort)); see IvfTopKRewrite for why
          // withNewChildren on the outer node alone would be wrong.
          case Some(newChild) => Limit(le, sort.withNewChildren(Seq(newChild)))
          case None => limit
        }
    }
  }

  /** sim expression behind the sort attribute: unwrap round() and require
    * cosine_sim(<column>, <literal vector>) (either argument order),
    * returning the ranked column attribute WITH the query vector so the
    * caller can check it is the registered embedding column.
    */
  private def simQueryVector(e: Expression): Option[(AttributeReference, Array[Double])] = e match {
    case r: Round => simQueryVector(r.child)
    case CosineSimilarity(a: AttributeReference, l: Literal) => literalVec(l).map((a, _))
    case CosineSimilarity(l: Literal, a: AttributeReference) => literalVec(l).map((a, _))
    case _ => None
  }

  private def literalVec(l: Literal): Option[Array[Double]] = (l.value, l.dataType) match {
    case (v: ArrayData, ArrayType(FloatType, _))  => Some(v.toFloatArray().map(_.toDouble))
    case (v: ArrayData, ArrayType(DoubleType, _)) => Some(v.toDoubleArray())
    case _ => None
  }

  private def tryRewrite(ref: AttributeReference,
                         child: LogicalPlan): Option[LogicalPlan] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val simExpr = child.collect { case p: Project => p.projectList }.flatten
      .collectFirst { case a: Alias if a.exprId == ref.exprId => a.child }
    for {
      (simAttr, qVec) <- simExpr.flatMap(simQueryVector)
      rel <- child.collectFirst {
        case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if HnswGraphRegistry.lookup(fs.location.rootPaths.map(_.toString)).isDefined => r
      }
      entry <- HnswGraphRegistry.lookup(
        rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString))
      idAttr <- rel.output.find(_.name == entry.idCol)
      // the ranked column must BE the indexed embedding column — another
      // vector column on the same table ranks differently (wrong-index
      // hijack) and must keep its exact scan
      if rel.output.exists(o => o.exprId == simAttr.exprId && o.name == entry.embCol)
      // idempotence under the fixed-point optimizer batch: fire once
      if !child.exists {
        case f: Filter => f.condition.exists {
          case In(a: AttributeReference, _) => a.name == entry.idCol
          case InSet(a: AttributeReference, _) => a.name == entry.idCol
          case _ => false
        }
        case _ => false
      }
      // user predicates between sort and scan may touch ONLY the id
      // column (they compose with the injected id set; anything else
      // changes which ids the true top-k holds — fall through)
      if child.collect { case f: Filter => f }.forall(
        _.condition.references.forall(_.name == entry.idCol))
    } yield {
      val ids = HnswGraphRegistry.beamIds(spark, entry, qVec)
      logInfo(s"HnswTopKRewrite: pruning ${rel.simpleString(50)} to " +
        s"${entry.idCol} IN (${ids.length} graph-served ids)")
      child.transformUp {
        case r: LogicalRelation if r eq rel =>
          Filter(In(idAttr, ids.map(Literal(_))), r)
      }
    }
  }
}
