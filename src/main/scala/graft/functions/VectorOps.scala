package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels as pure Catalyst higher-order-function expressions over
  * `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns — zero UDFs, fully codegen'd,
  * and SQL-expressible so every result can be checked against a DuckDB
  * oracle (`list_dot_product` over `DOUBLE[]` casts).
  *
  * Semantics mirror the reference kernels:
  *  - cosine: dot(a,b)/(|a||b|), 0.0 (not NaN) when either magnitude is 0
  *    (reference: DotNetVectorSearch.WebAPI/Services/VectorSearchService.cs:219-242)
  *  - l2Normalize: v/|v|, identity pass-through when |v| <= 1e-12
  *    (reference: DotNetVectorSearch.Core/Embeddings/E5MultilingualEmbeddings.cs:172-187)
  *
  * All math is performed in DOUBLE regardless of the storage element type
  * (an intentional precision upgrade over the reference's f32 accumulation —
  * required for bit-stable cross-engine oracle comparison; see SURVEY.md §7.0).
  *
  * Scale note: these are per-row scalar kernels — they parallelize with the
  * scan, add no shuffle, and stay inside whole-stage codegen. At 100 TB the
  * cost is the Parquet scan itself; similarity *search* on top of these is
  * shaped as TakeOrderedAndProject (per-partition bounded heap + driver
  * merge), not a full sort. See graft.operators.Knn.
  */
object VectorOps {

  /** Elementwise cast to double — makes downstream arithmetic double-typed. */
  def toDoubleArray(v: Column): Column = transform(v, _.cast("double"))

  /** dot(a, b) in double, left-to-right fold (deterministic association). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm in double. */
  def normSq(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** L2 norm in double. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity in [-1, 1]; 0.0 when either vector has zero magnitude
    * (matching the reference's guard rather than returning NaN). Dimension
    * mismatch RAISES, matching both the reference's ArgumentException
    * (DotNetVectorSearch.WebAPI/Services/VectorSearchService.cs:221-222) and
    * the fused native kernel (graft.expressions.CosineSimilarity) — the two
    * engine kernels must agree on this edge (PropertiesSpec asserts it).
    */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    val sim = when(na === lit(0.0) || nb === lit(0.0), lit(0.0))
      .otherwise(dot(a, b) / (na * nb))
    when(size(a) =!= size(b),
      raise_error(concat(lit("cosine: dimension mismatch ("),
        size(a).cast("string"), lit(" vs "), size(b).cast("string"), lit(")")))
        .cast("double"))
      .otherwise(sim)
  }

  /** Cosine similarity for pre-L2-normalized vectors: just the dot product.
    * The fast path for stored corpora normalized at ingest — one array walk
    * instead of three.
    */
  def cosinePreNormalized(a: Column, b: Column): Column = dot(a, b)

  /** v / |v|, pass-through when |v| <= 1e-12 (reference semantics). Output
    * element type double.
    */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n <= lit(1e-12), toDoubleArray(v))
      .otherwise(transform(v, x => x.cast("double") / n))
  }

  /** Euclidean (L2) distance in double. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))
}
