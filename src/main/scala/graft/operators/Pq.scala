package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the industry-standard vector compression:
  * split each d-dim vector into `m` subvectors, learn a small per-subspace
  * codebook (k-means, k codes), store each vector as m code bytes
  * (64 floats → 8 bytes here, 32×). Search runs ADC (asymmetric distance
  * computation): the query precomputes an m×k table of per-subspace dot
  * products — one TINY driver/broadcast artifact — and every corpus
  * vector's score is m table lookups over its code array, no float math.
  *
  * Scale shape: training is an offline sample job (the codebooks are
  * m·k·(d/m) doubles — KBs of broadcast index metadata, like IVF
  * centroids); encoding is map-only; ADC scoring is a map-only projection
  * + TakeOrderedAndProject shortlist; the exact rescore touches only the
  * shortlist. Composes with IVF (scan one cell, score codes) — IVFPQ.
  */
object Pq {

  /** books(s)(c) = centroid (subDim doubles) for code c of subspace s. */
  final case class Codebooks(m: Int, subDim: Int,
                             books: Array[Array[Array[Double]]]) extends Serializable

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()

  /** Deterministic on-disk location of the trained codebooks for (sfDir,
    * hyperparams) — pure path arithmetic, no build (mirrors
    * Ann.kmeansCentsPath). train() dumps the books here so that, with the
    * codes layout (Ivfpq.codesPath) also on disk, ADC-search-over-a-given
    * -index is deterministic and the DuckDB oracle can replay it — the
    * training stays engine-specific; the oracle never re-fits anything.
    */
  def booksPath(sfDir: String, dim: Int = 64, m: Int = 8, k: Int = 16,
                seed: Long = 42L): String =
    s"${sys.props("java.io.tmpdir")}/graft-pqbooks-" +
      Ann.pathToken(s"$sfDir/$dim/$m/$k/$seed")

  /** Train per-subspace codebooks on the corpus (seeded MLlib KMeans per
    * subspace — the offline index build; memoized per sf dir like the IVF
    * layouts).
    */
  def train(spark: SparkSession, sfDir: String, dim: Int = 64, m: Int = 8,
            k: Int = 16, seed: Long = 42L): Codebooks =
    cache.computeIfAbsent(s"$sfDir/$dim/$m/$k/$seed", { _ =>
      val subDim = dim / m
      // train on L2-NORMALIZED vectors: the search metric is cosine, and
      // dot-product ADC ranks like cosine only on the unit sphere.
      // The training set is a SAMPLE-scale artifact (at 100 TB you fit
      // codebooks on ~100k sampled vectors, not the corpus), so collapse
      // it to one cached partition: Lloyd iterations are many tiny jobs,
      // and 32 near-empty tasks per job is pure scheduler overhead — this
      // was a 30–100 s stage at sf0.1; single-partition it is seconds.
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(graft.functions.VectorOps.l2Normalize(
          graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("embedding"))
      fitBooks(spark, emb, m, subDim, k, seed, booksPath(sfDir, dim, m, k, seed))
    })

  /** The one fit-and-dump block behind [[train]] (raw vectors) and
    * [[trainResidual]] (residuals): ONE collect of the (sample-scale,
    * single-partition) fit input, then the m per-subspace fits run on
    * the driver via [[LocalKMeansFit]]'s local trainer — bit-identical
    * to the distributed `ml.KMeans.fit` (LocalKMeansSpec pins every
    * subspace seed), but zero Spark jobs instead of m·(~25-45) one-task
    * Lloyd/init jobs whose scheduler round-trips dominated this stage
    * (round-15; the round-5 fix had already collapsed the input to one
    * partition and overlapped the fits — the jobs themselves were the
    * remaining cost). The books dump as (s, code, cent) at `dumpPath` —
    * the replayable half of the index. One implementation so the two
    * trainers cannot silently diverge in fit, seed scheme, or dump
    * format. `emb` must carry a DOUBLE[] `embedding` column of length
    * m·subDim; `repartition(1)` is kept so the collected row order is
    * exactly the one the distributed fit folded.
    */
  private def fitBooks(spark: SparkSession, emb: DataFrame, m: Int,
                       subDim: Int, k: Int, seed: Long,
                       dumpPath: String): Codebooks = {
    val rows = emb.repartition(1).select(col("embedding")).collect()
      .map(_.getSeq[Double](0).toArray)
    val books = Array.tabulate(m) { s =>
      val sub = rows.map(r =>
        org.apache.spark.mllib.linalg.Vectors.dense(
          java.util.Arrays.copyOfRange(r, s * subDim, (s + 1) * subDim)))
      org.apache.spark.mllib.clustering.GraftLocalKMeans
        .fit(sub, k, maxIterations = 20, seed = seed + s,
          distanceMeasure = "euclidean")
        .map(_.toArray)
    }
    import spark.implicits._
    (for { s <- 0 until m; c <- books(s).indices }
      yield (s, c, books(s)(c).toSeq))
      .toDF("s", "code", "cent").coalesce(1)
      .write.mode("overwrite").parquet(dumpPath)
    Codebooks(m, subDim, books)
  }

  /** Bench-harness hook: forget the trained books so a second build can be
    * timed cold (see Ann.resetMemos).
    */
  private[graft] def resetMemos(): Unit =
    { cache.clear(); resCache.clear(); anchorCache.clear() }

  private val resCache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()

  /** On-disk location of the RESIDUAL codebooks (see [[trainResidual]]) —
    * keyed by the IVF geometry too, because residuals only exist relative
    * to a trained cell layout.
    */
  def resBooksPath(sfDir: String, dim: Int = 64, m: Int = 8, k: Int = 16,
                   seed: Long = 42L, cells: Int = 10): String =
    s"${sys.props("java.io.tmpdir")}/graft-pqresbooks-" +
      Ann.pathToken(s"$sfDir/$dim/$m/$k/$seed/$cells")

  /** On-disk location of the per-cell residual ANCHORS (see
    * [[residualAnchors]]) — the other dumped half of the residual index.
    */
  def resAnchorsPath(sfDir: String, cells: Int = 10, seed: Long = 42L): String =
    s"${sys.props("java.io.tmpdir")}/graft-pqresanchors-" +
      Ann.pathToken(s"$sfDir/$cells/$seed")

  private val anchorCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, Array[Double])]]()

  /** The per-cell residual anchor: the MEAN of the cell's L2-normalized
    * members — not the trained kmeans center. MLlib's cosine-distance
    * KMeans re-normalizes its centers to unit length, and on wide cells
    * that is catastrophic for residuals: E‖v − c‖² = 2 − 2·E[v·c] can
    * EXCEED the unit energy of v itself (measured on this corpus: raw
    * quantization MSE 0.54, unit-center residual MSE 0.68 — the
    * "residual" was harder than the vector). The cell mean is by
    * definition the anchor minimizing within-cell residual energy, so
    * E‖v − mean‖² = within-cell variance < 1 whenever cells capture any
    * structure at all. The probe still ranks the trained unit centers;
    * the anchor is purely the encoding-side offset — dot(q, v) ≈
    * dot(q, anchor_cell) + dot(q, r̃). Dumped beside the books (k·d
    * doubles — broadcast metadata) so the oracle can replay search.
    */
  def residualAnchors(spark: SparkSession, sfDir: String, cells: Int = 10,
                      seed: Long = 42L): Seq[(Int, Array[Double])] =
    anchorCache.computeIfAbsent(s"$sfDir/$cells/$seed", { _ =>
      val (kmDir, _) = Ann.kmeansLayout(spark, sfDir, cells, seed)
      // per-(cell, dimension) mean via posexplode: one partial-aggregable
      // shuffle of (cells × dim) groups — never a row-wise collect
      val anchors = spark.read.parquet(kmDir)
        .select(col("cell"), posexplode(graft.functions.VectorOps.l2Normalize(
          graft.functions.VectorOps.toDoubleArray(col("embedding")))))
        .groupBy(col("cell"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x("m")).as("anchor"))
      anchors.coalesce(1).write.mode("overwrite")
        .parquet(resAnchorsPath(sfDir, cells, seed))
      anchors.collect() // ≤cells rows of index metadata
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
        .sortBy(_._1)
    })

  /** Train codebooks on IVF RESIDUALS `v − centroid(cell(v))` (Jégou 2011
    * §III — the IVFADC encoding): after coarse quantization, what is left
    * to encode is the small displacement from the cell center, and k
    * codes spent on a compact residual distribution quantize far finer
    * than the same k spread over the whole sphere. One SHARED codebook
    * set serves every cell (the paper's memory/accuracy compromise for
    * multi-cell probes). ADC then scores
    * `dot(q, v) ≈ dot(q, c_cell) + dot(q, r̃)` — the first term is one
    * double per probed cell, the second the usual m table lookups.
    *
    * Same scale shape as [[train]]: the fit input is sample-scale, the
    * books are KBs of broadcast metadata, and the dump beside the codes
    * makes search-over-a-given-index replayable by the oracle.
    */
  def trainResidual(spark: SparkSession, sfDir: String, dim: Int = 64,
                    m: Int = 8, k: Int = 16, seed: Long = 42L,
                    cells: Int = 10): Codebooks =
    resCache.computeIfAbsent(s"$sfDir/$dim/$m/$k/$seed/$cells", { _ =>
      val subDim = dim / m
      val (kmDir, _) = Ann.kmeansLayout(spark, sfDir, cells, seed)
      val anchorsDf = Ann.centroidsDf(spark, residualAnchors(spark, sfDir, cells, seed))
        .withColumnRenamed("centroid", "anchor")
      val emb = spark.read.parquet(kmDir)
        .select(col("cell"), graft.functions.VectorOps.l2Normalize(
          graft.functions.VectorOps.toDoubleArray(col("embedding"))).as("nemb"))
        .join(broadcast(anchorsDf), Seq("cell"))
        .select(zip_with(col("nemb"), col("anchor"), (v, c) => v - c).as("embedding"))
      fitBooks(spark, emb, m, subDim, k, seed,
        resBooksPath(sfDir, dim, m, k, seed, cells))
    })

  /** Map-only encoding: each (L2-normalized, double[]) vector → its m
    * nearest-centroid codes (L2 per subspace, ties to the lower code id —
    * deterministic). A UDF is justified here: nearest-codebook argmin has
    * no built-in, and encoding is the offline index-build step, not the
    * query hot path (which is pure HOF table lookups, see adcScore).
    */
  def encode(vecs: DataFrame, embCol: String, cb: Codebooks): DataFrame = {
    val spark = vecs.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val enc = udf { (v: Seq[Double]) =>
      val c = bc.value
      Array.tabulate(c.m) { s =>
        var best = 0
        var bestD = Double.MaxValue
        var code = 0
        while (code < c.books(s).length) {
          var d = 0.0
          var i = 0
          while (i < c.subDim) {
            val diff = v(s * c.subDim + i) - c.books(s)(code)(i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = code }
          code += 1
        }
        best
      }
    }
    vecs.withColumn("codes", enc(col(embCol)))
  }

  /** ADC score table for a query: table(s)(c) = dot(q_s, centroid_{s,c}).
    * m×k doubles — the per-query broadcast artifact.
    */
  def adcTable(q: Array[Double], cb: Codebooks): Seq[Seq[Double]] =
    (0 until cb.m).map { s =>
      cb.books(s).toSeq.map { cent =>
        var d = 0.0
        var i = 0
        while (i < cb.subDim) { d += q(s * cb.subDim + i) * cent(i); i += 1 }
        d
      }
    }

  /** ADC scoring column: sum of per-subspace table lookups over `codes`. */
  def adcScore(table: Seq[Seq[Double]], m: Int) = {
    val t = typedLit(table)
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc +
        element_at(element_at(t, s + 1), element_at(col("codes"), s + 1) + 1))
  }
}
