package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed PCA over the embedding corpus — the trained dimensionality-
  * reduction family beside the training-free Matryoshka prefix (mrl_recall):
  * a learned rotation concentrates variance in the leading components, so a
  * 16-of-64-dim serving index retains more recall per stored byte than any
  * fixed prefix can.
  *
  * Scale shape (100 TB): the corpus reduces to ONE moment digest — count,
  * per-dimension sums, and the upper triangle of the second-moment matrix
  * (d·(d+3)/2 + 1 doubles ≈ 17 KB at d=64) — via map-side-combined hash
  * aggregation; the eigendecomposition runs on the DRIVER over the d×d
  * covariance (index-build metadata, the same posture as KMeans centers),
  * and the model ships back as k·d broadcast doubles. Projection is a
  * map-only dot-product fan-out. Nothing corpus-sized ever moves.
  *
  * The eigensolver is a from-scratch cyclic Jacobi (Golub & Van Loan §8.5
  * — public-knowledge numerical recipe; symmetric PSD input, guaranteed
  * convergence). Both model halves (mean + rotation) dump to parquet at
  * [[modelPath]], so the DuckDB oracle replays projection/serving over the
  * SAME trained state — the training itself is never re-fit (the
  * dumped-index replay pattern of Ann/Pq/Unigram).
  */
object Pca {

  private val models = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Drop the JVM memo so Bench's second stage pass times an equally-cold
    * build (see Ann.resetMemos — without this, stage:pca-model's second
    * sample reads ~0 s and min-of-2 ships a bogus number).
    */
  private[graft] def resetMemos(): Unit = models.clear()

  /** On-disk location of the dumped model for (sfDir, k): rows
    * (comp, eigval, w). comp = -1 holds the corpus mean; comps 0..k-1 the
    * top eigenvectors by eigenvalue descending.
    */
  def modelPath(sfDir: String, k: Int = 16): String =
    s"${sys.props("java.io.tmpdir")}/graft-pca-" + Ann.pathToken(s"$sfDir/$k")

  /** Fit-and-dump, once per JVM per (sfDir, k). Returns the model path. */
  def model(spark: SparkSession, sfDir: String, k: Int = 16): String =
    models.computeIfAbsent(s"$sfDir/$k", { _ =>
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(VectorOps.toDoubleArray(col("embedding")).as("v"))
      // Moment digest. The double posexplode blows each row up d·(d+1)/2-
      // fold BEFORE the partial agg folds it back to one digest per
      // partition — declarative and exactly-combinable; a fused typed
      // Aggregator would cut the per-row constant, but the shuffle is the
      // digest either way.
      val firsts = emb.select(posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("i")).agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getDouble(1)))
      val n = firsts.head._2.toDouble
      val d = firsts.length
      val mu = new Array[Double](d)
      firsts.foreach { case (i, _, sx) => mu(i) = sx / n }
      val seconds = emb
        .select(posexplode(col("v")).as(Seq("i", "x")), col("v"))
        .select(col("i"), col("x"), posexplode(col("v")).as(Seq("j", "y")))
        .filter(col("j") >= col("i"))
        .groupBy(col("i"), col("j")).agg(sum(col("x") * col("y")).as("sxy"))
        .collect() // d·(d+1)/2 rows — model-build metadata, not corpus
      val cov = Array.ofDim[Double](d, d)
      seconds.foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        val c = r.getDouble(2) / n - mu(i) * mu(j)
        cov(i)(j) = c; cov(j)(i) = c
      }
      val (eigvals, eigvecs) = jacobiEig(cov)
      // top-k by eigenvalue desc (index asc tiebreak), sign-canonicalized:
      // largest-|component| coordinate positive — eigenvector sign is
      // arbitrary, the dump must not flip between builds of the same input
      val order = eigvals.indices.sortBy(i => (-eigvals(i), i)).take(k)
      val rows = order.zipWithIndex.map { case (src, comp) =>
        val w = Array.tabulate(d)(r => eigvecs(r)(src))
        val pivot = w.indices.maxBy(i => (math.abs(w(i)), -i))
        val fixed = if (w(pivot) < 0) w.map(-_) else w
        (comp, eigvals(src), fixed.toSeq)
      } :+ (-1, 0.0, mu.toSeq)
      import spark.implicits._
      val path = modelPath(sfDir, k)
      rows.toDF("comp", "eigval", "w").coalesce(1)
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns V) with A·V(:,i) = λi·V(:,i).
    */
  private[graft] def jacobiEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) { var q = p + 1; while (q < n) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = {
              val s = if (theta >= 0) 1.0 else -1.0
              s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < n) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < n) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < n) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
