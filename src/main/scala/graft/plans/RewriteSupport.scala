package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
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
}
