package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Descending, EqualTo, Expression, In, InSet, Literal, Round, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.CosineSimilarity

/** Transparent ANN: a Catalyst optimizer rule that rewrites exact top-k
  * vector search over an IVF-laid-out table into probe-and-prune.
  *
  * A user writes the *exact* query —
  * `ORDER BY cosine_sim(embedding, <literal query vector>) DESC LIMIT k` —
  * against a table stored partitioned by its IVF cell column. If that
  * table's index is registered in [[IvfIndexRegistry]], this rule probes the
  * (driver-resident, tiny) cell medoids, picks the nearest cell, and injects
  * `Filter(cell = best)` directly above the scan. FileSourceStrategy then
  * turns that filter into a partition-pruning predicate, so the physical
  * plan reads ONE cell directory instead of the whole corpus — the I/O shape
  * that makes vector search viable at 100 TB (1/cells of the scan; the
  * registry holds one centroid per cell, a few KB).
  *
  * Opting in = registering the index, exactly like creating an ANN index in
  * a vector database: the rewrite is approximate by construction (recall <
  * 1.0 when the true neighbor lives outside the probed cell), so it never
  * fires on unregistered tables, and the exact scan remains the oracle.
  */
object IvfIndexRegistry {

  /** One registered IVF index: partition (cell) column name + per-cell
    * medoid vectors, held driver-side.
    */
  final case class Entry(cellCol: String, medoids: Seq[(Int, Array[Double])]) {

    /** Nearest cell by cosine-to-medoid; sim rounded to 6dp and ties broken
      * by cell id, mirroring Ann.ivfSearch's probe so both paths (and the
      * DuckDB oracle) pick the identical cell.
      */
    def bestCell(q: Array[Double]): Int =
      medoids.map { case (cell, m) =>
        // HALF_UP to match Spark's round(sim, 6) in Ann.ivfSearch and the
        // DuckDB oracle — math.rint is half-even and could probe a different
        // cell on an exact .5-ulp tie.
        (cell, BigDecimal(cosine(m, q)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.minBy { case (cell, s) => (-s, cell) }._1

    private def cosine(a: Array[Double], b: Array[Double]): Double = {
      require(a.length == b.length, s"dim ${a.length} vs ${b.length}")
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  private val registry = new ConcurrentHashMap[String, Entry]()

  private def canon(path: String): String = RewriteSupport.canon(path)

  /** Build + register the index for a cell-partitioned parquet table: one
    * medoid (min-id member) per cell, collected to the driver. At real
    * scale this collect is #cells rows — the index metadata, not the data.
    */
  def register(spark: SparkSession, path: String, cellCol: String,
               idCol: String, embCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(path)
    val medoids = graft.operators.Ann.cellMedoids(df, cellCol, idCol, embCol)
      .select(col("cell"),
        graft.functions.VectorOps.toDoubleArray(col("centroid")).as("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
    registry.put(canon(path), Entry(cellCol, medoids))
  }

  /** Register an index from EXPLICIT cell representatives — trained
    * k-means centers (Ann.kmeansLayout) instead of recomputed medoids.
    */
  def registerCentroids(path: String, cellCol: String,
                        centroids: Seq[(Int, Array[Double])]): Unit =
    registry.put(canon(path), Entry(cellCol, centroids.sortBy(_._1)))

  def lookup(rootPaths: Seq[String]): Option[Entry] =
    rootPaths.iterator.map(p => Option(registry.get(canon(p))))
      .collectFirst { case Some(e) => e }

  /** Registered (canon table path, entry) rows — the catalog face. */
  def entries: Seq[(String, Entry)] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq.sortBy(_._1)
  }

  def isEmpty: Boolean = registry.isEmpty

  def clear(): Unit = registry.clear()
}

/** The rewrite rule (injected via GraftExtensions.injectOptimizerRule). */
case class IvfTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (IvfIndexRegistry.isEmpty) return plan
    plan.transformDown {
      case limit @ Limit(le,
          sort @ Sort(SortOrder(ref: AttributeReference, Descending, _, _) +: _, true, child, _)) =>
        tryRewrite(ref, child) match {
          // Rebuild via Limit.apply: the Limit extractor matched
          // GlobalLimit(LocalLimit(sort)), so withNewChildren on the outer
          // node alone would silently drop the LocalLimit and with it the
          // per-partition top-k (TakeOrderedAndProject) this rule exists
          // to keep cheap.
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
    case CosineSimilarity(_: AttributeReference, l: Literal) => RewriteSupport.literalVec(l)
    case CosineSimilarity(l: Literal, _: AttributeReference) => RewriteSupport.literalVec(l)
    case _ => None
  }

  private def tryRewrite(ref: AttributeReference, child: LogicalPlan): Option[LogicalPlan] = {
    val simExpr = child.collect { case p: Project => p.projectList }.flatten
      .collectFirst { case a: Alias if a.exprId == ref.exprId => a.child }
    for {
      qVec <- simExpr.flatMap(simQueryVector)
      rel <- child.collectFirst {
        case r @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if IvfIndexRegistry.lookup(fs.location.rootPaths.map(_.toString)).isDefined => r
      }
      entry <- IvfIndexRegistry.lookup(
        rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString))
      // index precedence: the graph rewrite (injected FIRST — see
      // GraftExtensions) outranks this rule on a table carrying both
      // indexes, but only when it actually FIRED: its In/InSet filter on
      // the graph's registered id column is in the plan. When the graph
      // rule fell through (k > its beam, a non-id predicate, a different
      // ranked column), this rule still serves the query — a cell prune
      // beats the silent full exact scan that deferring on bare registry
      // membership would force. Stacking is impossible both ways: this
      // guard detects the graph's filter, and the graph rule's own
      // id-only-filter guard rejects a plan carrying this rule's cell
      // equality. The detection is exprId-hardened (round-10 advisor): the
      // id attribute must be THE registered relation's resolved column —
      // not a same-named column from elsewhere on the spine — and the In
      // list must fit the graph's beam width, since the injected filter is
      // always the ≤ Ef-id final beam. A USER-written `vec_id IN (<many>)`
      // predicate (which makes the graph rule decline — In is not a benign
      // exclusion) therefore no longer reads as "the graph fired", and the
      // cell prune still serves instead of a silent full exact scan.
      if !HnswGraphRegistry.lookup(
        rel.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.toString))
        .exists { ge =>
          val gIdAttr = rel.output.find(_.name == ge.idCol)
          child.exists {
            case f: Filter => f.condition.exists {
              case In(a: AttributeReference, vs) =>
                gIdAttr.exists(_.exprId == a.exprId) &&
                  vs.length <= graft.operators.Hnsw.Ef
              case InSet(a: AttributeReference, vs) =>
                gIdAttr.exists(_.exprId == a.exprId) &&
                  vs.size <= graft.operators.Hnsw.Ef
              case _ => false
            }
            case _ => false
          }
        }
      cellAttr <- rel.output.find(_.name == entry.cellCol)
      // idempotence under the fixed-point optimizer batch: fire once
      if !child.exists {
        case f: Filter => f.condition.exists {
          case EqualTo(a: AttributeReference, _: Literal) => a.name == entry.cellCol
          case EqualTo(_: Literal, a: AttributeReference) => a.name == entry.cellCol
          case _ => false
        }
        case _ => false
      }
    } yield {
      val best = entry.bestCell(qVec)
      logInfo(s"IvfTopKRewrite: pruning ${rel.simpleString(50)} to ${entry.cellCol}=$best")
      child.transformUp {
        case r: LogicalRelation if r eq rel =>
          Filter(EqualTo(cellAttr, Literal(best)), r)
      }
    }
  }
}
