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
  * never the corpus, and its result is k ids of driver metadata) — and
  * injects `Filter(vec_id IN (<top-k ids>))` above the scan. The user's
  * own sort then EXACT-rescores just those k rows, so the plan after the
  * rewrite reads k corpus rows instead of all of them, and the served
  * order is the graph's top-k re-ranked by true cosine.
  *
  * Approximate by construction, so strictly opt-in (register), memoized
  * per (graph, query vector, k) so AQE re-optimization costs nothing,
  * idempotent under the fixed-point optimizer batch (the In-filter
  * guard), and falls through untouched for unregistered tables.
  */
object HnswGraphRegistry {

  /** One registered graph index over a corpus table path. */
  final case class Entry(idCol: String, edgesDir: String, metaDir: String)

  private val registry = new ConcurrentHashMap[String, Entry]()
  private val probeMemo =
    new ConcurrentHashMap[(String, Seq[Double], Int), Seq[Long]]()

  private def canon(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  def register(corpusPath: String, idCol: String, edgesDir: String,
               metaDir: String): Unit =
    registry.put(canon(corpusPath), Entry(idCol, edgesDir, metaDir))

  def lookup(rootPaths: Seq[String]): Option[Entry] =
    rootPaths.iterator.map(p => Option(registry.get(canon(p))))
      .collectFirst { case Some(e) => e }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = { registry.clear(); probeMemo.clear() }

  /** The graph-index probe: run the bounded beam walk for the literal
    * query vector, return the top-k ids (rnk order). Memoized — the
    * optimizer may visit the same plan more than once (fixed-point
    * batches, AQE re-planning) and the walk is a pure function of
    * (graph, qVec, k).
    */
  def topKIds(spark: SparkSession, e: Entry, qVec: Array[Double],
              k: Int): Seq[Long] =
    probeMemo.computeIfAbsent((e.edgesDir, qVec.toSeq, k), { _ =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val qdf = Seq((0L, qVec.toSeq)).toDF("qid", "q_emb")
        .select(col("qid"), col("q_emb").cast("array<float>").as("q_emb"))
      graft.operators.Hnsw.searchIn(spark, e.edgesDir, e.metaDir, qdf, k)
        .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
    })
}

/** The rewrite rule (injected via GraftExtensions.injectOptimizerRule). */
case class HnswTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (HnswGraphRegistry.isEmpty) return plan
    plan.transformDown {
      case limit @ Limit(le @ Literal(k: Int, IntegerType),
          sort @ Sort(SortOrder(ref: AttributeReference, Descending, _, _) +: _, true, child, _)) =>
        tryRewrite(ref, child, k) match {
          // Rebuild via Limit.apply — the extractor matched
          // GlobalLimit(LocalLimit(sort)); see IvfTopKRewrite for why
          // withNewChildren on the outer node alone would be wrong.
          case Some(newChild) => Limit(le, sort.withNewChildren(Seq(newChild)))
          case None => limit
        }
    }
  }

  /** sim expression behind the sort attribute: unwrap round() and require
    * cosine_sim(<column>, <literal vector>) (either argument order).
    */
  private def simQueryVector(e: Expression): Option[Array[Double]] = e match {
    case r: Round => simQueryVector(r.child)
    case CosineSimilarity(_: AttributeReference, l: Literal) => literalVec(l)
    case CosineSimilarity(l: Literal, _: AttributeReference) => literalVec(l)
    case _ => None
  }

  private def literalVec(l: Literal): Option[Array[Double]] = (l.value, l.dataType) match {
    case (v: ArrayData, ArrayType(FloatType, _))  => Some(v.toFloatArray().map(_.toDouble))
    case (v: ArrayData, ArrayType(DoubleType, _)) => Some(v.toDoubleArray())
    case _ => None
  }

  private def tryRewrite(ref: AttributeReference, child: LogicalPlan,
                         k: Int): Option[LogicalPlan] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val simExpr = child.collect { case p: Project => p.projectList }.flatten
      .collectFirst { case a: Alias if a.exprId == ref.exprId => a.child }
    for {
      qVec <- simExpr.flatMap(simQueryVector)
      rel <- child.collectFirst {
        case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if HnswGraphRegistry.lookup(fs.location.rootPaths.map(_.toString)).isDefined => r
      }
      entry <- HnswGraphRegistry.lookup(
        rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString))
      idAttr <- rel.output.find(_.name == entry.idCol)
      // idempotence under the fixed-point optimizer batch: fire once
      if !child.exists {
        case f: Filter => f.condition.exists {
          case In(a: AttributeReference, _) => a.name == entry.idCol
          case InSet(a: AttributeReference, _) => a.name == entry.idCol
          case _ => false
        }
        case _ => false
      }
    } yield {
      val ids = HnswGraphRegistry.topKIds(spark, entry, qVec, k)
      logInfo(s"HnswTopKRewrite: pruning ${rel.simpleString(50)} to " +
        s"${entry.idCol} IN (${ids.length} graph-served ids)")
      child.transformUp {
        case r: LogicalRelation if r eq rel =>
          Filter(In(idAttr, ids.map(Literal(_))), r)
      }
    }
  }
}
