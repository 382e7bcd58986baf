package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, IsNotNull, Literal, Not}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Shared helpers for the transparent-index rewrite rules (IvfTopKRewrite,
  * HnswTopKRewrite): ONE path canonicalization (registry keys and
  * maintenance-side invalidation must agree on `file:` prefixes and
  * trailing slashes) and ONE literal-query-vector extractor — the pieces
  * both rules must never let drift.
  */
private[plans] object RewriteSupport {

  def canon(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  /** The literal query vector behind an ORDER BY cosine_sim(col, <lit>),
    * as doubles (either float or double array literals).
    */
  def literalVec(l: Literal): Option[Array[Double]] = (l.value, l.dataType) match {
    case (v: ArrayData, ArrayType(FloatType, _))  => Some(v.toFloatArray().map(_.toDouble))
    case (v: ArrayData, ArrayType(DoubleType, _)) => Some(v.toDoubleArray())
    case _ => None
  }

  /** Some(#distinct excluded ids) iff EVERY conjunct of every condition is
    * a provably benign id exclusion: `NOT (id = <literal>)` or
    * `IS NOT NULL(id)` (matched by exprId against the registered
    * relation's id attribute, so an identically-named column from
    * elsewhere can never pass). Anything else — ranges, IN lists, non-id
    * references — returns None and the caller falls through. ONE
    * definition shared by the single-query and batch graph rewrites: the
    * k + e ≤ Ef headroom argument (the unfiltered top-(k+e) ⊆ the beam
    * provably contains the filtered top-k) is identical on both faces.
    */
  def benignExclusions(conds: Seq[Expression],
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
}
