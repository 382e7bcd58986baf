package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** Structural gates for the trained-PCA model (operators/Pca): the dumped
  * (mean, rotation) parquet is the contract the oracles replay over, so
  * its mathematical invariants are pinned here.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("Jacobi eigensolver recovers a known spectrum") {
    // [[2,1],[1,2]] → eigenvalues {3, 1}, eigenvectors (1,1)/√2, (1,-1)/√2
    val (vals, vecs) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // A·v = λ·v for each column
    for (c <- 0 until 2) {
      val v = Array(vecs(0)(c), vecs(1)(c))
      val av = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      val lam = vals(c)
      assert(math.abs(av(0) - lam * v(0)) < 1e-10)
      assert(math.abs(av(1) - lam * v(1)) < 1e-10)
    }
  }

  test("dumped model: eigenvalues descending and nonnegative, rows orthonormal") {
    Pca.model(spark, sf)
    val m = spark.read.parquet(Pca.modelPath(sf))
    val comps = m.filter(col("comp") >= 0).orderBy(col("comp"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    assert(comps.length === 16)
    val eigs = comps.map(_._2)
    assert(eigs.zip(eigs.tail).forall { case (a, b) => a >= b - 1e-12 },
      s"eigenvalues not descending: ${eigs.mkString(",")}")
    assert(eigs.forall(_ >= -1e-10), "covariance must be PSD")
    // pairwise orthonormality of the rotation rows
    for (i <- comps.indices; j <- i until comps.length) {
      val d = comps(i)._3.zip(comps(j)._3).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-8, s"w($i)·w($j) = $d, expected $expect")
    }
    // mean row present with the right arity
    val mu = m.filter(col("comp") === -1).collect()
    assert(mu.length === 1 && mu.head.getSeq[Double](2).length === 64)
  }

  test("retained variance grows with k and the projection energy matches the spectrum") {
    Pca.model(spark, sf)
    val m = spark.read.parquet(Pca.modelPath(sf))
    val comps = m.filter(col("comp") >= 0).orderBy(col("comp"))
      .collect().map(r => (r.getDouble(1), r.getSeq[Double](2).toArray))
    val mu = m.filter(col("comp") === -1).collect().head.getSeq[Double](2).toArray
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    // per-component projection variance over the corpus ≈ its eigenvalue:
    // the digest-aggregated covariance and a direct per-row computation
    // must tell the same story (catches a transposed eigenvector matrix,
    // a wrong triangle fill, or mean/moment mix-ups)
    comps.take(4).zipWithIndex.foreach { case ((eig, w), k) =>
      val proj = vecs.map(v => v.zip(w).map { case (x, c) => x * c }.sum -
        mu.zip(w).map { case (x, c) => x * c }.sum)
      val mean = proj.sum / n
      val varP = proj.map(p => (p - mean) * (p - mean)).sum / n
      assert(math.abs(varP - eig) < 1e-6,
        s"component $k: projection variance $varP vs eigenvalue $eig")
    }
  }
}
