package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.expressions.GraftFunctions
import graft.functions.{TextOps, VectorOps}
import graft.operators.{Ann, Knn, Pca}

/** Vector-search surface: reference parity for SURVEY.md §2A O12-O16 plus
  * the batch/threshold generalizations. All kernels are HOF expressions —
  * the scans stream, the only data movement is the broadcast of the (tiny)
  * query side and the final top-k merge on the driver.
  */
object VectorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O14: brute-force exact top-k by cosine similarity, query = vec_id 0.
    "knn_topk" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding",
        k = 5, keep = Seq("vec_id", "label"))
    }),

    // O14 again through the fused native Catalyst expression (single-pass
    // dot+norms loop, whole-stage codegen) — must produce bit-identical
    // results to the HOF kernel; Bench measures the speedup.
    "knn_topk_fused" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .select(col("vec_id"), col("label"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(5)
    }),

    // O14 over the reference's actual storage shape: embeddings persisted
    // in an embedded JDBC store as JSON text (SQLite in the reference,
    // Derby here — the embedded DB that ships with Spark), read back with
    // a partitioned JDBC scan + from_json vector decode, then knn. The
    // oracle reads the original parquet — hash-match proves the
    // write→JDBC-read→JSON-decode round-trip is lossless.
    "jdbc_knn" -> ((s, dir) => {
      val emb = graft.sources.JdbcStore.readEmbeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id", "embedding",
        k = 5, keep = Seq("vec_id", "label"))
    }),

    // O14 batch generalization: 3 query vectors ranked per-query via window.
    "knn_batch" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      Knn.topKBatch(emb.filter(col("vec_id") >= 3), qs, "vec_id", "embedding",
          k = 3, keep = Seq("vec_id", "label"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // knn_batch through the CUSTOM physical operator (TopKPerKeyPlan →
    // partial/final TopKPerKeyExec): per-key bounded heaps on the map side
    // mean the shuffle carries each partition's ≤k survivors per query
    // instead of every scored row — the window formulation (knn_batch)
    // must shuffle-and-sort all of them. Same oracle as knn_batch except
    // k: proof the custom operator computes exact per-key top-k.
    "knn_batch_custom" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      val scored = emb.filter(col("vec_id") >= 3)
        .crossJoin(broadcast(qs))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
        .select(col("qid"), col("vec_id"), col("label"), col("sim"))
      val top = graft.operators.TopK.perKey(scored, Seq("qid"),
        Seq(("sim", false), ("vec_id", true)), k = 3)
      // rank labeling runs over the ≤ k·q-row result, not the corpus
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
      top.withColumn("rnk", row_number().over(w))
        .select(col("qid"), col("vec_id"), col("label"), col("sim"), col("rnk"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // O14 + the documented-but-unimplemented score threshold (§2A
    // fine-print 1): filter sim >= 0.2, then the API's topK clamp bound 50.
    "search_threshold" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("embedding"), col("q_emb")), 6))
        .filter(col("sim") >= 0.2)
        .select(col("vec_id"), col("label"), col("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc)
        .limit(50)
    }),

    // O15: pairwise similarity over stored vectors (vec 0 vs vec 1).
    "pairwise_sim" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val a = emb.filter(col("vec_id") === 0).select(col("embedding").as("emb_a"))
      val b = emb.filter(col("vec_id") === 1).select(col("embedding").as("emb_b"))
      a.crossJoin(b).select(round(VectorOps.cosine(col("emb_a"), col("emb_b")), 6).as("sim"))
    }),

    // O15 over text: embed two documents with the "query: " prefix (the
    // reference prefixes BOTH sides of pairwise similarity) and score.
    "text_pairwise_sim" -> ((s, dir) => {
      val d = documents(s, dir)
      val a = d.filter(col("doc_id") === 0)
        .withColumn("raw", TextOps.hashEmbedRaw(TextOps.queryText(col("text"))))
        .select(VectorOps.l2Normalize(col("raw")).as("emb_a"))
      val b = d.filter(col("doc_id") === 1)
        .withColumn("raw", TextOps.hashEmbedRaw(TextOps.queryText(col("text"))))
        .select(VectorOps.l2Normalize(col("raw")).as("emb_b"))
      a.crossJoin(b).select(round(VectorOps.cosine(col("emb_a"), col("emb_b")), 6).as("sim"))
    }),

    // Vector aggregation: per-label centroid (mean vector), flattened to
    // (label, pos, val) — posexplode then partial+final avg; only the
    // (label, pos) digests shuffle, never whole vectors.
    "centroid_by_label" -> ((s, dir) => {
      embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("val"))
        .orderBy(col("label"), col("pos"))
    }),

    // The same centroid via the typed Aggregator UDAF (one whole-vector
    // buffer per group per partition crosses the shuffle instead of one
    // row per dimension) — same oracle as centroid_by_label, proving the
    // two formulations agree to 1e-6.
    "vector_mean" -> ((s, dir) => {
      embeddings(s, dir)
        .groupBy(col("label"))
        .agg(graft.operators.VectorAgg.vectorMeanCol(col("embedding")).as("mv"))
        .select(col("label"), posexplode(col("mv")))
        .select(col("label"), col("pos"), round(col("col"), 6).as("val"))
        .orderBy(col("label"), col("pos"))
    }),

    // O12: the reference's only SQL query — full scan ORDER BY id.
    "all_documents" -> ((s, dir) =>
      documents(s, dir).orderBy(col("doc_id"))),

    // O16: corpus count reported with every search response.
    "doc_count" -> ((s, dir) =>
      documents(s, dir).agg(count(lit(1)).as("total_documents"))),

    // O5-O10 (Prepare pipeline ≡ csv → concat " : " → "passage: " prefix →
    // embed → sink): combined_text projection, embedding dims, unit norm.
    "prepare_documents" -> ((s, dir) => {
      // fused native embed kernel (bit-identical to the HOF oracle chain)
      val d = spread(documents(s, dir))
        .withColumn("combined_text", concat(col("source"), lit(" : "), col("text")))
        .withColumn("emb", TextOps.hashEmbedFused(TextOps.passageText(col("combined_text"))))
      d.select(
        col("doc_id"), col("combined_text"),
        size(col("emb")).as("embedding_dimensions"),
        round(VectorOps.norm(col("emb")), 6).as("emb_norm"))
        .orderBy(col("doc_id"))
    }),

    // O7 execution shape: batched model inference via mapPartitions with a
    // broadcast model handle — one model init per partition, rows streamed
    // through in batches (the way a real ONNX session slots in; see
    // BatchedInference). The stand-in model is bit-identical to the
    // expression path, so this oracle is the SAME hash-match as
    // embed_documents — proving batched ≡ per-row.
    "embed_batched" -> ((s, dir) => {
      import s.implicits._
      val docs = spread(documents(s, dir))
        .select(col("doc_id"), TextOps.passageText(col("text")).as("text"))
        .as[graft.operators.BatchedInference.DocText]
      graft.operators.BatchedInference
        .embedPartitions(docs, () => new graft.operators.BatchedInference.HashingEmbedder())
        .toDF()
        .select(col("doc_id"), posexplode(col("embedding")))
        .select(col("doc_id"), col("pos").as("bucket"),
          round(col("col"), 6).as("weight"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // Int8 scalar quantization per vector (the compression step before an
    // index ships to serving): per-vector min/max affine map to [0,255]
    // codes + reconstruction-error audit. Map-only projection — each
    // vector is quantized independently, no shuffle; at 100 TB this is
    // the same single-pass kernel shape as embedding itself. Intermediates
    // are staged as columns (not re-inlined HOFs) so the interpreted-HOF
    // path evaluates each stage once.
    "quantize_embeddings" -> ((s, dir) => {
      val staged = spread(embeddings(s, dir))
        .withColumn("d", transform(col("embedding"), x => x.cast("double")))
        .withColumn("lo", array_min(col("d")))
        .withColumn("hi", array_max(col("d")))
        .withColumn("scale", (col("hi") - col("lo")) / 255.0)
        .withColumn("codes",
          when(col("hi") === col("lo"), transform(col("d"), _ => lit(0L)))
            .otherwise(transform(col("d"),
              x => round((x - col("lo")) / col("scale")).cast("long"))))
        .withColumn("err", zip_with(col("d"), col("codes"),
          (x, c) => abs(x - (col("lo") + c.cast("double") * col("scale")))))
      staged.select(col("vec_id"),
        size(col("d")).as("dim"),
        round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"),
        aggregate(col("codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        array_max(col("codes")).as("code_max"),
        round(array_max(col("err")), 6).as("max_abs_err"))
        .orderBy(col("vec_id"))
    }),

    // Recall@k audit: IVF-pruned ANN (ann_ivf's plan) scored against the
    // exact brute-force top-k — the quality gate every approximate index
    // ships with. Both sides are k-row results, so the join is a driver-
    // trivial semi-join; the expensive parts reuse the exact/IVF operators
    // unchanged.
    "ann_recall" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val exact = Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id",
        "embedding", k = 5, keep = Seq("vec_id")).select(col("vec_id"))
      val approx = Ann.ivfSearch(emb, q, "label", "vec_id", "embedding",
        k = 5, excludeId = Some(0L)).select(col("vec_id"))
      approx.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(0L).as("qid"), lit(5).as("k"), col("n_hit"),
          round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // O10 batch embed: the full corpus embedded in one distributed
    // projection, flattened to (doc_id, bucket, weight) for the oracle.
    // Matryoshka-style dimension truncation (Kusupati et al. 2022) with
    // the shortlist-and-rescore serving pattern: rank by cosine over the
    // FIRST 32 of 64 dims (half the I/O and FLOPs — at 100 TB the
    // truncated prefix is its own column/file), take a 20-deep shortlist,
    // re-score ONLY those 20 with full-dimension cosine, and audit
    // recall@5 against the exact full-dim scan. Fully deterministic →
    // fully oracled (unlike trained-index recall audits).
    "mrl_recall" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val corpus = emb.filter(col("vec_id") =!= 0)
      val exact = Knn.topK(corpus, q, "vec_id", "embedding", k = 5,
        keep = Seq("vec_id")).select(col("vec_id"))
      val shortlist = corpus.crossJoin(broadcast(q))
        .withColumn("tsim", round(VectorOps.cosine(
          slice(col("embedding"), 1, 32), slice(col("q_emb"), 1, 32)), 6))
        .orderBy(col("tsim").desc, col("vec_id").asc).limit(20)
        .select(col("vec_id"), col("embedding"))
      val rerank = shortlist.crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("embedding"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        .select(col("vec_id"))
      rerank.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(32).as("trunc_dim"), lit(20).as("shortlist"), lit(5).as("k"),
          col("n_hit"), round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // Binary quantization + Hamming shortlist + exact rescore — the
    // modern vector-DB compression pattern (1 bit/dim = 64× smaller than
    // float32; Hamming agreement is a popcount). Shortlist by sign-bit
    // agreement count (20 deep), re-score with full cosine, audit
    // recall@5 vs exact. Deterministic → fully oracled.
    "bq_rerank_recall" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val corpus = emb.filter(col("vec_id") =!= 0)
      val exact = Knn.topK(corpus, q, "vec_id", "embedding", k = 5,
        keep = Seq("vec_id")).select(col("vec_id"))
      val agree = size(filter(
        zip_with(col("embedding"), col("q_emb"), (x, y) => (x > 0) === (y > 0)),
        v => v))
      val shortlist = corpus.crossJoin(broadcast(q))
        .withColumn("n_agree", agree)
        .orderBy(col("n_agree").desc, col("vec_id").asc).limit(20)
        .select(col("vec_id"), col("embedding"))
      val rerank = shortlist.crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("embedding"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        .select(col("vec_id"))
      rerank.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(64).as("n_bits"), lit(20).as("shortlist"), lit(5).as("k"),
          col("n_hit"), round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // Product quantization + ADC search + exact rescore (Jégou 2011 —
    // the industry-standard 32× vector compression; see operators/Pq):
    // offline per-subspace codebooks + STORED code table (the serving
    // shape — codes are written once by the index build, query time is 8
    // HOF table lookups per vector over the codes scan), top-20 shortlist
    // (TakeOrderedAndProject), exact cosine rescore of the shortlist only,
    // recall@5 audited vs the exact scan. ORACLED by dumped-index replay:
    // both halves of the trained index are on disk (Pq.booksPath +
    // Ivfpq.codesPath), so DuckDB replays the identical ADC fold,
    // shortlist, and rescore over the SAME trained state — the training
    // itself stays engine-specific and is never re-fit.
    "pq_rerank_recall" -> ((s, dir) => {
      val cb = graft.operators.Pq.train(s, dir)
      val emb = embeddings(s, dir)
      val norm = emb.select(col("vec_id"),
        VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("nemb"))
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val qVec = norm.filter(col("vec_id") === 0) // 1-row query fetch
        .head().getSeq[Double](1).toArray
      val exact = Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id",
        "embedding", k = 5, keep = Seq("vec_id")).select(col("vec_id"))
      val table = graft.operators.Pq.adcTable(qVec, cb)
      val codes = s.read.parquet(graft.operators.Ivfpq.codesLayout(s, dir))
        .filter(col("vec_id") =!= 0) // PQ-alone: every cell of the codes table
      val shortlist = codes
        .withColumn("adc", round(graft.operators.Pq.adcScore(table, cb.m), 6))
        .orderBy(col("adc").desc, col("vec_id").asc).limit(20)
        .select(col("vec_id"))
      // full-precision vectors are touched for the 20 shortlist rows only
      val rerank = norm.join(broadcast(shortlist), Seq("vec_id"), "left_semi")
        .crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("nemb"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        .select(col("vec_id"))
      rerank.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(8).as("m"), lit(16).as("k_codes"), lit(20).as("shortlist"),
          lit(5).as("k"), col("n_hit"),
          round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // IVFPQ — the industry-standard serving index: trained IVF cells
    // (partition-pruned codes scan, nprobe=3 of 10 → ~30% of the already-
    // 32×-compressed codes table read) × PQ ADC scoring (table lookups, no
    // float math) × exact rescore of the 20-vector shortlist; recall@5
    // audited vs the exact scan. ORACLED by dumped-index replay (centers +
    // codebooks + codes all on disk — see pq_rerank_recall); AnnPqSpec
    // additionally pins nprobe=all ≡ PQ-alone and asserts the static
    // partition pruning. See operators/Ivfpq.
    "ivfpq_rerank_recall" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val qn = emb.filter(col("vec_id") === 0)
        .select(VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("n"))
        .head().getSeq[Double](0).toArray // 1-row query fetch
      val exact = Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id",
        "embedding", k = 5, keep = Seq("vec_id")).select(col("vec_id"))
      val approx = graft.operators.Ivfpq.search(s, dir, qn,
        excludeId = Some(0L), k = 5, shortlistN = 20, nprobe = 3)
        .select(col("vec_id"))
      approx.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(10).as("cells"), lit(3).as("nprobe"), lit(8).as("m"),
          lit(16).as("k_codes"), lit(20).as("shortlist"), lit(5).as("k"),
          col("n_hit"), round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // IVFADC proper (Jégou 2011 §III): same serving plan as
    // ivfpq_rerank_recall — static-pruned codes scan, ADC table lookups,
    // 20-vector exact rescore — but the codes quantize the RESIDUAL
    // v − centroid(cell) with residual-trained codebooks, and the ADC
    // score adds back the per-cell dot(q, centroid) first-order term
    // (driver arithmetic over broadcast metadata, injected as a literal).
    // Cell geometry is no longer re-spent by the product quantizer, so
    // recall at equal (m, k_codes, shortlist) dominates the non-residual
    // variant (AnnPqSpec asserts it). Same dumped-index replay oracle:
    // residual books + residual codes + centers are all parquet.
    "ivfpq_res_rerank_recall" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val qn = emb.filter(col("vec_id") === 0)
        .select(VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("n"))
        .head().getSeq[Double](0).toArray // 1-row query fetch
      val exact = Knn.topK(emb.filter(col("vec_id") =!= 0), q, "vec_id",
        "embedding", k = 5, keep = Seq("vec_id")).select(col("vec_id"))
      val approx = graft.operators.Ivfpq.searchResidual(s, dir, qn,
        excludeId = Some(0L), k = 5, shortlistN = 20, nprobe = 3)
        .select(col("vec_id"))
      approx.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(10).as("cells"), lit(3).as("nprobe"), lit(8).as("m"),
          lit(16).as("k_codes"), lit(20).as("shortlist"), lit(5).as("k"),
          col("n_hit"), round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // Serving-index operability dashboard: per-cell population of the
    // residual codes layout — the numbers an operator reads to decide
    // compaction (file accumulation), retraining (cell-size skew = the
    // coarse quantizer no longer fits the data), and nprobe tuning
    // (share = expected scan fraction per probed cell). One shuffle of
    // (cell, count) digests; the codes themselves never move.
    "ivf_index_stats" -> ((s, dir) => {
      val cellCounts = s.read
        .parquet(graft.operators.Ivfpq.resCodesLayout(s, dir))
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      val tot = cellCounts.agg(sum(col("n_vecs")).as("tot"))
      cellCounts.crossJoin(broadcast(tot))
        .select(col("cell"), col("n_vecs"),
          round(col("n_vecs").cast("double") / col("tot"), 6).as("share"))
        .orderBy(col("cell"))
    }),

    // Metadata-filtered exact search — the "vector search with a WHERE
    // clause" every production store exposes: top-k cosine among
    // embeddings whose DOCUMENT row satisfies lang = 'en' (predicate on a
    // separate metadata table, the realistic shape). The allowed ids
    // reach the scorer via a semi-join BEFORE any scoring; only survivors
    // are scored and ranked (TakeOrderedAndProject).
    "knn_filtered" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val allowed = documents(s, dir).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Knn.topK(emb.filter(col("vec_id") =!= 0)
          .join(allowed, Seq("vec_id"), "left_semi"),
        q, "vec_id", "embedding", k = 10, keep = Seq("vec_id"))
    }),

    // Metadata-filtered IVFADC — the same predicate pushed into the
    // residual serving index with PRE-filter semantics: the allowed-id
    // semi-join restricts the codes scan BEFORE the ADC shortlist, so all
    // 20 shortlist slots go to vectors satisfying the predicate
    // (post-filtering an unfiltered top-k starves on selective predicates
    // — AnnPqSpec demonstrates). Oracled by the dumped-index replay with
    // the identical filter on the codes CTE.
    "ivfpq_res_filtered" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val qn = emb.filter(col("vec_id") === 0)
        .select(VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("n"))
        .head().getSeq[Double](0).toArray // 1-row query fetch
      val allowed = documents(s, dir).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      graft.operators.Ivfpq.searchResidual(s, dir, qn, excludeId = Some(0L),
        k = 5, shortlistN = 20, nprobe = 3, filterIds = Some(allowed))
    }),

    // Tombstone deletes — the third maintenance verb of the serving index
    // (append / compact / DELETE): ids 1 and 2 are logically deleted from
    // a caller-owned clone of the codes layout (sidecar parquet; serves
    // anti-join it broadcast) and the search no longer returns them,
    // without any cell file being rewritten. compactResLayout later drops
    // the rows physically (AnnPqSpec). The MUTATION is the one-time
    // staged build (stage:ivfpq-deldemo) — the query measures the search
    // over the mutated index; the oracle replays the PRISTINE dumped
    // codes (byte-identical to the clone) with vec_id NOT IN (1,2).
    "ivfpq_res_deleted" -> ((s, dir) => {
      val ivfpq = graft.operators.Ivfpq
      val emb = embeddings(s, dir)
      val qn = emb.filter(col("vec_id") === 0)
        .select(VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("n"))
        .head().getSeq[Double](0).toArray // 1-row query fetch
      val clone = ivfpq.deletedDemoLayout(s, dir)
      ivfpq.searchResidual(s, dir, qn, excludeId = Some(0L),
        k = 5, shortlistN = 20, nprobe = 3, codesDirOverride = Some(clone))
    }),

    // Cell split rebalancing — the repair for POPULATION skew, the other
    // axis ivf_index_stats watches (files → compaction, rows → split):
    // the most populous cell of a cloned layout is split in two by a
    // deterministic 2-means over just that cell (other cells untouched,
    // shared codebooks frozen, atomic-swap rewrite), and the search
    // serves with the post-split metadata. The SPLIT is the one-time
    // staged build (stage:ivfpq-splitdemo); the query measures the
    // post-split search. Oracled by replaying the probe + anchor-ADC +
    // rescore over the layout's own dumped post-split
    // centers/anchors/codes. See Ivfpq.splitCell.
    "ivfpq_res_split" -> ((s, dir) => {
      val ivfpq = graft.operators.Ivfpq
      val emb = embeddings(s, dir)
      val qn = emb.filter(col("vec_id") === 0)
        .select(VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("n"))
        .head().getSeq[Double](0).toArray // 1-row query fetch
      val (clone, cents2, anchors2) = ivfpq.splitDemoLayout(s, dir)
      ivfpq.searchResidual(s, dir, qn, excludeId = Some(0L),
        k = 5, shortlistN = 20, nprobe = 3,
        codesDirOverride = Some(clone),
        indexOverride = Some((cents2, anchors2)))
    }),

    // Batch IVFADC — the bulk/serving face of the residual index: three
    // queries served in ONE job (union-of-probed-cells pruned scan, per-
    // query ADC tables as a broadcast literal, TopKPerKey shortlist,
    // rescore of shortlist rows only). Self-matches excluded. Oracled by
    // the same dumped-index replay, per qid. See Ivfpq.searchBatchResidual.
    "ivfpq_res_batch" -> ((s, dir) => {
      val qs = embeddings(s, dir).filter(col("vec_id") < 3)
        .select(col("vec_id"),
          VectorOps.l2Normalize(VectorOps.toDoubleArray(col("embedding"))).as("qn"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      graft.operators.Ivfpq.searchBatchResidual(s, dir, qs,
          k = 5, shortlistN = 20, nprobe = 3)
        .orderBy(col("qid"), col("rnk"))
    }),

    // IR evaluation metrics — MRR and binary nDCG@10 of the exact cosine
    // ranking against label-match relevance, per query: the quality
    // harness a retrieval engine ships with (the recall@k audits grade
    // the INDEX vs the exact scan; this grades the RANKING vs ground
    // truth). Order-deterministic on purpose: MRR is a max (no
    // summation), DCG folds an rnk-ORDERED list, IDCG folds an ascending
    // sequence — so the DuckDB replay is bit-equal before round(…, 6).
    "retrieval_mrr" -> ((s, dir) => {
      val emb = embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      val labelCounts = emb.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
      val log2 = (x: org.apache.spark.sql.Column) => log(x) / log(lit(2.0))
      val top = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", round(VectorOps.cosine(
          VectorOps.toDoubleArray(col("embedding")),
          VectorOps.toDoubleArray(col("q_emb"))), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .withColumn("rel", (col("label") === col("q_label")).cast("int"))
        .withColumn("term",
          when(col("rel") === 1, lit(1.0) / log2(col("rnk") + lit(1.0)))
            .otherwise(lit(0.0)))
      top.groupBy(col("qid"), col("q_label"))
        .agg(
          max(when(col("rel") === 1, lit(1.0) / col("rnk")).otherwise(0.0)).as("mrr0"),
          sort_array(collect_list(struct(col("rnk"), col("term")))).as("terms"),
          sum(col("rel")).cast("long").as("n_rel_10"))
        .join(broadcast(labelCounts), col("q_label") === col("label"))
        .withColumn("dcg", aggregate(col("terms"), lit(0.0),
          (acc, x) => acc + x("term")))
        // clamp the sequence stop to ≥1: sequence(1, 0) auto-steps -1 in
        // Spark (yielding [1, 0] and a 1/log2(1) = Inf term) while DuckDB's
        // generate_series(1, 0) is empty — so a query whose label is unique
        // (n_label = 1) would silently diverge across engines. The clamp
        // plus the explicit zero branch below keeps both sides at 0.0.
        .withColumn("idcg", aggregate(
          sequence(lit(1), greatest(least(col("n_label") - 1, lit(10)), lit(1))),
          lit(0.0),
          (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0))))
        .select(col("qid"), col("n_rel_10"), round(col("mrr0"), 6).as("mrr"),
          round(when(col("n_label") > 1, col("dcg") / col("idcg"))
            .otherwise(lit(0.0)), 6).as("ndcg10"))
        .orderBy(col("qid"))
    }),

    "embed_documents" -> ((s, dir) => {
      spread(documents(s, dir))
        .withColumn("emb", TextOps.hashEmbedFused(TextOps.passageText(col("text"))))
        .select(col("doc_id"), posexplode(col("emb")))
        .select(col("doc_id"), col("pos").as("bucket"),
          round(col("col"), 6).as("weight"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // MMR diversified rerank of the flagship search: distributed top-20
    // shortlist + pairwise sims, then the (inherently sequential) greedy
    // over the collected 20-row matrix on the driver — see Mmr scaladoc.
    // Oracled by unrolling the k greedy argmax steps as DuckDB CTEs.
    "mmr_rerank" -> ((s, dir) =>
      graft.operators.Mmr.rerank(s, dir, qId = 0L, k = 5, shortlistN = 20,
        lam = 0.7, mu = 0.3)),

    // Trained-PCA projection (see operators/Pca): the corpus reduces to a
    // d·(d+3)/2 moment digest, the driver eigendecomposes the d×d
    // covariance, and the dumped (mean, rotation) model projects map-only.
    // Long-form (vec_id, comp, pval) so the oracle replays the identical
    // dot-product arithmetic over the DUMPED model — training never re-fit.
    // pval = v·w − μ·w (both sides compute it exactly this way: the two
    // dot products are each a deterministic left fold / list_dot_product).
    "pca_project" -> ((s, dir) => {
      Pca.model(s, dir)
      val m = s.read.parquet(Pca.modelPath(dir))
      val w = m.filter(col("comp") >= 0).select(col("comp"), col("w"))
      val mu = m.filter(col("comp") === -1).select(col("w").as("mu"))
      embeddings(s, dir).filter(col("vec_id") < 50)
        .withColumn("v", VectorOps.toDoubleArray(col("embedding")))
        .crossJoin(broadcast(mu))
        .crossJoin(broadcast(w))
        .select(col("vec_id"), col("comp"),
          round(VectorOps.dot(col("v"), col("w")) -
            VectorOps.dot(col("mu"), col("w")), 6).as("pval"))
        .orderBy(col("vec_id"), col("comp"))
    }),

    // Explained-variance report off the dumped model — the table you size
    // the serving dimension from (how many components buy how much
    // variance). Share is of the retained top-16 mass.
    "pca_variance" -> ((s, dir) => {
      Pca.model(s, dir)
      val m = s.read.parquet(Pca.modelPath(dir)).filter(col("comp") >= 0)
      val tot = m.agg(sum(col("eigval")).as("tot"))
      m.crossJoin(broadcast(tot))
        .select(col("comp"), round(col("eigval"), 6).as("eigval"),
          round(col("eigval") / col("tot"), 6).as("share"))
        .orderBy(col("comp"))
    }),

    // Recall audit of PCA-compressed retrieval — the trained sibling of
    // mrl_recall at the same 4× compression (16 of 64 dims). Honest
    // caveat, documented by pca_variance: the fixture embeddings are
    // near-ISOTROPIC (flat eigenvalue spectrum, ~7% per component), so 16
    // retained dims hold ~25% of variance no matter how they're chosen and
    // recall@5 lands low for ANY 16-dim method; on real embedding corpora
    // (fast-decaying spectra) the trained rotation is what makes 4×
    // compression usable. The audit pipeline is the deliverable: rank by
    // cosine in the projected space (components quantized to 6 dp at the
    // model boundary on BOTH sides), 20-deep shortlist, exact full-dim
    // rescore, recall@5 vs the exact scan. The rotation is collected
    // driver-side (k·d doubles — index metadata, same posture as KMeans
    // centers) and enters the plan as literals: projection stays map-only.
    "pca_recall" -> ((s, dir) => {
      Pca.model(s, dir)
      val m = s.read.parquet(Pca.modelPath(dir))
      val wrows = m.filter(col("comp") >= 0).orderBy(col("comp")).collect()
        .map(_.getSeq[Double](2))
      val muLit = typedLit(m.filter(col("comp") === -1).collect()
        .head.getSeq[Double](2))
      // ONE k×d 2-D literal + a transform fold instead of k unrolled
      // per-component typedLit dot products — same per-element arithmetic
      // (identical fold, identical rounding) but a constant-size
      // expression tree, so plan/codegen cost stays flat as k grows
      val wLit = typedLit(wrows.toSeq.map(_.toSeq))
      def proj(v: Column): Column = transform(wLit, wk =>
        round(VectorOps.dot(v, wk) - VectorOps.dot(muLit, wk), 6))
      val emb = embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val corpus = emb.filter(col("vec_id") =!= 0)
      val exact = Knn.topK(corpus, q, "vec_id", "embedding", k = 5,
        keep = Seq("vec_id")).select(col("vec_id"))
      val pq = q.select(proj(VectorOps.toDoubleArray(col("q_emb"))).as("qp"))
      val shortlist = corpus
        .withColumn("p", proj(VectorOps.toDoubleArray(col("embedding"))))
        .crossJoin(broadcast(pq))
        .withColumn("tsim", round(VectorOps.cosine(col("p"), col("qp")), 6))
        .orderBy(col("tsim").desc, col("vec_id").asc).limit(20)
        .select(col("vec_id"), col("embedding"))
      val rerank = shortlist.crossJoin(broadcast(q))
        .withColumn("sim", round(VectorOps.cosine(col("embedding"), col("q_emb")), 6))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(5)
        .select(col("vec_id"))
      rerank.join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .select(lit(16).as("pca_dim"), lit(20).as("shortlist"), lit(5).as("k"),
          col("n_hit"), round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
    }),

    // Semi-supervised label spread — the auto-labeling step of a training
    // corpus: every 5th vector keeps its gold label, a serving batch of
    // unlabeled vectors takes the majority vote of its 5 nearest labeled
    // neighbors (cosine; ties → larger vote count, then smaller label).
    // Plan shape = knn_batch: broadcast query panel, per-qid rank window,
    // then a votes-sized argmax window. At full scale the labeled corpus
    // side rides the IVF layout instead of a flat scan — the vote logic
    // is unchanged.
    "knn_label_spread" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = embeddings(s, dir)
      val labeled = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("lid"), col("embedding"), col("label"))
      val un = emb.filter(col("vec_id") % 5 =!= 0 && col("vec_id") < 40)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
      val scored = labeled.crossJoin(broadcast(un))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
      val wTop = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("lid").asc)
      val votes = scored.withColumn("rnk", row_number().over(wTop))
        .filter(col("rnk") <= 5)
        .groupBy(col("qid"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val wWin = Window.partitionBy(col("qid"))
        .orderBy(col("n_votes").desc, col("label").asc)
      votes.withColumn("w", row_number().over(wWin))
        .filter(col("w") === 1)
        .select(col("qid").as("vec_id"), col("label").as("pred_label"),
          col("n_votes"))
        .orderBy(col("vec_id"))
    }),

    // Embedding drift monitor — the ML-ops gate between embedding-model
    // versions: per-label centroid cosine + L2 shift between the current
    // corpus and its next revision (simulated: half the vectors scaled
    // and offset deterministically). Everything reduces to the
    // (label, dim) mean digest — two map-side-combined aggregates and
    // 640-row arithmetic; re-embedding 100 TB is compared through KBs.
    "embedding_drift" -> ((s, dir) => {
      val emb = embeddings(s, dir)
        .withColumn("v", VectorOps.toDoubleArray(col("embedding")))
      val v2 = emb.withColumn("v",
        when(col("vec_id") % 2 === 0,
          transform(col("v"), x => x * lit(1.02) + lit(0.01)))
          .otherwise(col("v")))
      def centroids(df: DataFrame, out: String) = df
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim")).agg(avg(col("x")).as(out))
      centroids(emb, "m1").join(centroids(v2, "m2"), Seq("label", "dim"))
        .groupBy(col("label"))
        .agg(sum(col("m1") * col("m2")).as("dot"),
          sum(col("m1") * col("m1")).as("n1"),
          sum(col("m2") * col("m2")).as("n2"),
          sum(pow(col("m1") - col("m2"), 2)).as("shift2"))
        .select(col("label"),
          round(col("dot") / sqrt(col("n1") * col("n2")), 6).as("centroid_cos"),
          round(sqrt(col("shift2")), 6).as("centroid_shift"))
        .orderBy(col("label"))
    }),

    // Hard-negative mining — the contrastive-training staple: for each
    // anchor, the most SIMILAR vectors of a DIFFERENT class (random
    // negatives are too easy; these sit at the decision boundary and carry
    // the gradient). knn_batch plan with the label-mismatch predicate
    // pushed below the rank window; at scale the candidate set comes from
    // the ANN index and the mismatch filter rides the probe.
    "hard_negatives" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = embeddings(s, dir)
      val anchors = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("q_emb"),
          col("label").as("q_label"))
      val scored = emb.crossJoin(broadcast(anchors))
        .filter(col("label") =!= col("q_label"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("rnk"), col("vec_id").as("neg_id"),
          col("label").as("neg_label"), col("sim"))
        .orderBy(col("qid"), col("rnk"))
    }),

    // Margin-based bitext mining (Artetxe & Schwenk 2019, "ratio" margin):
    // the parallel-corpus miner for translation training data. A raw
    // cosine threshold over two monolingual corpora drowns in hubs —
    // vectors similar to EVERYTHING; the margin normalizes each pair score
    // by both endpoints' average k-NN similarity, so only pairs that are
    // mutually MUCH closer than their neighborhoods survive (margin > 1).
    // Corpora = even/odd vec_ids. The cross-score table is staged once
    // (three consumers: forward k-NN averages, backward averages, pair
    // scores); at 100 TB the candidate pairs and both k-NN shortlists come
    // from the trained ANN layout instead of the exact cross join — the
    // margin arithmetic is unchanged.
    "bitext_margin" -> ((s, dir) => {
      GraftFunctions.register(s)
      val emb = embeddings(s, dir)
      val a = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("id_a"), col("embedding").as("ea"))
        // the corpus reads as ONE input split, so the |A|·|B| scoring ran
        // single-task; explicit id-hash spread (AQE-proof — the pair
        // stream is CPU-dense but byte-small, guide §2.5)
        .repartition(s.sparkContext.defaultParallelism, col("id_a"))
      val b = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      val scored = a.crossJoin(broadcast(b))
        .withColumn("sim", round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6))
        .select(col("id_a"), col("id_b"), col("sim"))
        .localCheckpoint()
      def knnAvg(key: String, other: String, out: String) = {
        val w = Window.partitionBy(col(key))
          .orderBy(col("sim").desc, col(other).asc)
        scored.withColumn("r", row_number().over(w)).filter(col("r") <= 4)
          .groupBy(col(key)).agg(avg(col("sim")).as(out))
      }
      scored
        .join(knnAvg("id_a", "id_b", "avg_a"), "id_a")
        .join(knnAvg("id_b", "id_a", "avg_b"), "id_b")
        .withColumn("margin",
          round(col("sim") / ((col("avg_a") + col("avg_b")) / 2), 6))
        .filter(col("margin") > 1.0)
        .select(col("id_a"), col("id_b"), col("sim"), col("margin"))
        .orderBy(col("margin").desc, col("id_a"), col("id_b"))
        .limit(10)
    })
  )

  /** Cosine similarity of two DOUBLE[] expressions in DuckDB, with the
    * reference's zero-magnitude guard.
    */
  def duckCosine(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a, $a)) = 0 OR sqrt(list_dot_product($b, $b)) = 0
       | THEN 0.0
       | ELSE list_dot_product($a, $b)
       |   / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
       |END""".stripMargin

  /** The hashing-embedder pipeline as DuckDB CTEs ending in
    * `emb(doc_id, bucket, weight)`. `textExpr` is a SQL expression over a
    * `documents` row alias `d0`; `where` optionally restricts the doc set.
    * Must mirror graft.functions.TextOps.hashEmbed exactly: lower → split
    * [^a-z0-9]+ → drop empty → first 512 → poly-hash(31, mod 1e9+7) →
    * bucket h%64, sign by h%128<64 → signed counts → L2 normalize with the
    * 1e-12 pass-through.
    */
  def duckEmbedCte(textExpr: String, where: String = ""): String =
    duckEmbedCteAs("", textExpr, where)

  /** [[duckEmbedCte]] with every CTE name prefixed by `p` (final CTE is
    * `${p}emb`) so two embedding pipelines — e.g. a query-prefixed literal
    * and the passage-prefixed corpus — can coexist in one oracle query.
    */
  def duckEmbedCteAs(p: String, textExpr: String, where: String = ""): String =
    s"""${p}toks AS (
       |  SELECT d0.doc_id, unnest(list_slice(list_filter(
       |    string_split_regex(lower($textExpr), '[^a-z0-9]+'), t -> t <> ''), 1, 512)) AS tok
       |  FROM documents d0 $where
       |), ${p}hashed AS (
       |  SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
       |    list_transform(generate_series(1, length(tok)), i -> ascii(tok[i])::BIGINT)),
       |    (acc, c) -> (acc * 31 + c) % 1000000007) AS h
       |  FROM ${p}toks
       |), ${p}sums AS (
       |  SELECT doc_id, h % 64 AS bucket,
       |    sum(CASE WHEN h % 128 < 64 THEN 1.0 ELSE -1.0 END) AS s
       |  FROM ${p}hashed GROUP BY 1, 2
       |), ${p}grid AS (
       |  SELECT d.doc_id, g.bucket, coalesce(s.s, 0.0) AS s
       |  FROM (SELECT d0.doc_id FROM documents d0 $where) d
       |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bucket) g
       |  LEFT JOIN ${p}sums s USING (doc_id, bucket)
       |), ${p}norms AS (SELECT doc_id, sqrt(sum(s * s)) AS n FROM ${p}grid GROUP BY 1),
       |${p}emb AS (
       |  SELECT g.doc_id, g.bucket,
       |    CASE WHEN n.n <= 1e-12 THEN g.s ELSE g.s / n.n END AS weight
       |  FROM ${p}grid g JOIN ${p}norms n USING (doc_id)
       |)""".stripMargin

  /** Shared dumped-PQ-index replay CTEs (ending in `short`): read the
    * trained codebooks + cell-partitioned codes the Spark queries
    * searched (Verify resolves the __PQ_BOOKS__/__IVFPQ_CODES__
    * placeholders), rebuild the query's ADC table, and replay the
    * identical left-fold score + (adc DESC, vec_id ASC) shortlist.
    * `codesWhere` optionally restricts the codes scan (IVFPQ cell probe).
    */
  private def duckPqShortCtes(codesWhere: String): String =
    s"""books AS (SELECT s, code, cent::DOUBLE[] AS cent
       |          FROM read_parquet('__PQ_BOOKS__/*.parquet')),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |qn AS (SELECT list_transform(qe,
       |         x -> x / sqrt(list_dot_product(qe, qe))) AS qn FROM q),
       |adc AS (SELECT b.s, b.code,
       |          list_dot_product(b.cent, list_slice(n.qn, b.s*8+1, b.s*8+8)) AS dot
       |        FROM books b CROSS JOIN qn n),
       |codes AS (SELECT vec_id, codes, cell
       |          FROM read_parquet('__IVFPQ_CODES__/*/*.parquet', hive_partitioning=true)
       |          WHERE vec_id <> 0$codesWhere),
       |scored AS (
       |  SELECT c.vec_id,
       |    round(list_reduce(list_prepend(0.0::DOUBLE, list(a.dot ORDER BY a.s)),
       |      (acc, x) -> acc + x), 6) AS adcs
       |  FROM codes c
       |  CROSS JOIN generate_series(0, 7) g(s)
       |  JOIN adc a ON a.s = g.s AND a.code = c.codes[g.s + 1]
       |  GROUP BY c.vec_id),
       |short AS (SELECT vec_id FROM scored ORDER BY adcs DESC, vec_id ASC LIMIT 20),
       |nemb AS (SELECT e.vec_id,
       |    list_transform(e.embedding::DOUBLE[], x -> x
       |      / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS nemb
       |  FROM embeddings e JOIN short USING (vec_id)),
       |exact AS (SELECT e.vec_id FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> 0
       |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
       |    e.vec_id ASC
       |  LIMIT 5)""".stripMargin

  /** `cell IN (<the 3 probed cells>)` — the nprobe=3 cosine probe replayed
    * over the dumped centers (the trained ones by default; a maintained
    * layout's own dump — e.g. post-split — via `centsGlob`). Shared by
    * every IVFPQ/IVFADC oracle replay.
    */
  private def duckProbe3Where(centsGlob: String = "__IVFKM_CENTS__"): String =
    s""" AND cell IN (
      |  SELECT cell FROM (
      |    SELECT c.cell FROM read_parquet('$centsGlob/*.parquet') c
      |    CROSS JOIN (SELECT list_transform(embedding::DOUBLE[],
      |        x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS qn
      |      FROM embeddings WHERE vec_id = 0) nq
      |    ORDER BY round(""".stripMargin +
      duckCosine("c.centroid::DOUBLE[]", "nq.qn") +
      """, 6) DESC, c.cell ASC
      |    LIMIT 3))""".stripMargin

  /** Dumped-RESIDUAL-index replay CTEs (ending in `short`): like
    * [[duckPqShortCtes]] but over the residual books/codes, with the ADC
    * score carrying the per-cell `dot(q, centroid)` first-order term —
    * replayed as `qc.qdotc + <the same left fold>`, mirroring
    * Ivfpq.searchResidual's `element_at(map, cell) + adcScore` exactly.
    */
  private def duckResShortCtes(codesWhere: String,
                               anchorsGlob: String = "__PQRES_ANCHORS__",
                               codesGlob: String = "__IVFPQRES_CODES__"): String =
    s"""books AS (SELECT s, code, cent::DOUBLE[] AS cent
       |          FROM read_parquet('__PQRES_BOOKS__/*.parquet')),
       |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
       |qn AS (SELECT list_transform(qe,
       |         x -> x / sqrt(list_dot_product(qe, qe))) AS qn FROM q),
       |adc AS (SELECT b.s, b.code,
       |          list_dot_product(b.cent, list_slice(n.qn, b.s*8+1, b.s*8+8)) AS dot
       |        FROM books b CROSS JOIN qn n),
       |qc AS (SELECT c.cell,
       |         list_dot_product(c.anchor::DOUBLE[], n.qn) AS qdotc
       |       FROM read_parquet('$anchorsGlob/*.parquet') c CROSS JOIN qn n),
       |codes AS (SELECT vec_id, codes, cell
       |          FROM read_parquet('$codesGlob/*/*.parquet', hive_partitioning=true)
       |          WHERE vec_id <> 0$codesWhere),
       |scored AS (
       |  SELECT c.vec_id,
       |    round(qc.qdotc + list_reduce(list_prepend(0.0::DOUBLE, list(a.dot ORDER BY a.s)),
       |      (acc, x) -> acc + x), 6) AS adcs
       |  FROM codes c
       |  JOIN qc ON qc.cell = c.cell
       |  CROSS JOIN generate_series(0, 7) g(s)
       |  JOIN adc a ON a.s = g.s AND a.code = c.codes[g.s + 1]
       |  GROUP BY c.vec_id, qc.qdotc),
       |short AS (SELECT vec_id FROM scored ORDER BY adcs DESC, vec_id ASC LIMIT 20),
       |nemb AS (SELECT e.vec_id,
       |    list_transform(e.embedding::DOUBLE[], x -> x
       |      / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS nemb
       |  FROM embeddings e JOIN short USING (vec_id)),
       |exact AS (SELECT e.vec_id FROM embeddings e CROSS JOIN q
       |  WHERE e.vec_id <> 0
       |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
       |    e.vec_id ASC
       |  LIMIT 5)""".stripMargin

  val oracles: Map[String, String] = Map(

    // PCA replay over the dumped (mean, rotation) model — identical
    // dot-product arithmetic; the training (moment digest + driver Jacobi)
    // is never re-fit, the dump is the contract (Ann/Pq/Unigram pattern).
    "pca_project" ->
      """WITH mm AS (SELECT comp, w FROM read_parquet('__PCA_MODEL__/*.parquet')),
        |mu AS (SELECT w AS mu FROM mm WHERE comp = -1),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |      FROM embeddings WHERE vec_id < 50)
        |SELECT e.vec_id, m.comp,
        |  round(list_dot_product(e.v, m.w) - list_dot_product(mu.mu, m.w), 6) AS pval
        |FROM e CROSS JOIN mu
        |CROSS JOIN (SELECT comp, w FROM mm WHERE comp >= 0) m
        |ORDER BY e.vec_id, m.comp""".stripMargin,

    "pca_variance" ->
      """WITH m AS (SELECT comp, eigval
        |           FROM read_parquet('__PCA_MODEL__/*.parquet') WHERE comp >= 0),
        |t AS (SELECT sum(eigval) AS tot FROM m)
        |SELECT comp, round(eigval, 6) AS eigval,
        |  round(eigval / tot, 6) AS share
        |FROM m CROSS JOIN t ORDER BY comp""".stripMargin,

    "pca_recall" ->
      s"""WITH mm AS (SELECT comp, w FROM read_parquet('__PCA_MODEL__/*.parquet')),
         |mu AS (SELECT w AS mu FROM mm WHERE comp = -1),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT e.vec_id,
         |    list(round(list_dot_product(e.v, m.w) - list_dot_product(mu.mu, m.w), 6)
         |      ORDER BY m.comp) AS p
         |  FROM e CROSS JOIN mu
         |  JOIN mm m ON m.comp >= 0
         |  GROUP BY e.vec_id),
         |qp AS (SELECT p AS qp FROM p WHERE vec_id = 0),
         |q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
         |exact AS (SELECT e.vec_id FROM e CROSS JOIN q WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("e.v", "q.qe")}, 6) DESC, e.vec_id ASC
         |  LIMIT 5),
         |short AS (SELECT p.vec_id FROM p CROSS JOIN qp WHERE p.vec_id <> 0
         |  ORDER BY round(${duckCosine("p.p", "qp.qp")}, 6) DESC, p.vec_id ASC
         |  LIMIT 20),
         |rr AS (SELECT e.vec_id FROM e JOIN short USING (vec_id) CROSS JOIN q
         |  ORDER BY round(${duckCosine("e.v", "q.qe")}, 6) DESC, e.vec_id ASC
         |  LIMIT 5)
         |SELECT 16 AS pca_dim, 20 AS shortlist, 5 AS k,
         |  (SELECT count(*) FROM rr JOIN exact USING (vec_id)) AS n_hit,
         |  round((SELECT count(*) FROM rr JOIN exact USING (vec_id))::DOUBLE / 5.0,
         |    6) AS recall""".stripMargin,

    "knn_label_spread" ->
      s"""WITH l AS (SELECT vec_id AS lid, embedding::DOUBLE[] AS v, label
         |           FROM embeddings WHERE vec_id % 5 = 0),
         |u AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |      FROM embeddings WHERE vec_id % 5 <> 0 AND vec_id < 40),
         |scored AS (
         |  SELECT u.qid, l.lid, l.label,
         |    round(${duckCosine("l.v", "u.qv")}, 6) AS sim
         |  FROM l CROSS JOIN u),
         |top5 AS (
         |  SELECT qid, lid, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, lid ASC) AS rnk FROM scored)
         |  WHERE rnk <= 5),
         |votes AS (
         |  SELECT qid, label, count(*) AS n_votes
         |  FROM top5 GROUP BY qid, label)
         |SELECT qid AS vec_id, label AS pred_label, n_votes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY n_votes DESC, label ASC) AS w FROM votes)
         |WHERE w = 1 ORDER BY vec_id""".stripMargin,

    "embedding_drift" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |e2 AS (SELECT vec_id, label,
        |         CASE WHEN vec_id % 2 = 0
        |           THEN list_transform(v, x -> x * 1.02 + 0.01) ELSE v END AS v
        |       FROM e),
        |c1 AS (SELECT label, dim, avg(x) AS m1 FROM (
        |         SELECT label, unnest(v) AS x,
        |           unnest(generate_series(0, len(v) - 1)) AS dim FROM e) t
        |       GROUP BY label, dim),
        |c2 AS (SELECT label, dim, avg(x) AS m2 FROM (
        |         SELECT label, unnest(v) AS x,
        |           unnest(generate_series(0, len(v) - 1)) AS dim FROM e2) t
        |       GROUP BY label, dim),
        |j AS (SELECT c1.label, c1.m1, c2.m2
        |      FROM c1 JOIN c2 ON c1.label = c2.label AND c1.dim = c2.dim)
        |SELECT label,
        |  round(sum(m1 * m2) / sqrt(sum(m1 * m1) * sum(m2 * m2)), 6)
        |    AS centroid_cos,
        |  round(sqrt(sum(pow(m1 - m2, 2))), 6) AS centroid_shift
        |FROM j GROUP BY label ORDER BY label""".stripMargin,

    "hard_negatives" ->
      s"""WITH a AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
         |             label AS q_label
         |           FROM embeddings WHERE vec_id < 10),
         |s AS (
         |  SELECT a.qid, e.vec_id, e.label,
         |    round(${duckCosine("e.embedding::DOUBLE[]", "a.qv")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN a
         |  WHERE e.label <> a.q_label)
         |SELECT qid, rnk, vec_id AS neg_id, label AS neg_label, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vec_id ASC) AS rnk FROM s)
         |WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,

    "bitext_margin" ->
      s"""WITH a AS (SELECT vec_id AS id_a, embedding::DOUBLE[] AS ea
         |           FROM embeddings WHERE vec_id % 2 = 0),
         |b AS (SELECT vec_id AS id_b, embedding::DOUBLE[] AS eb
         |      FROM embeddings WHERE vec_id % 2 = 1),
         |s AS (SELECT id_a, id_b,
         |        round(${duckCosine("ea", "eb")}, 6) AS sim
         |      FROM a CROSS JOIN b),
         |na AS (SELECT id_a, avg(sim) AS avg_a FROM (
         |         SELECT *, row_number() OVER (PARTITION BY id_a
         |           ORDER BY sim DESC, id_b ASC) AS r FROM s)
         |       WHERE r <= 4 GROUP BY id_a),
         |nb AS (SELECT id_b, avg(sim) AS avg_b FROM (
         |         SELECT *, row_number() OVER (PARTITION BY id_b
         |           ORDER BY sim DESC, id_a ASC) AS r FROM s)
         |       WHERE r <= 4 GROUP BY id_b),
         |m AS (SELECT s.id_a, s.id_b, s.sim,
         |        round(s.sim / ((na.avg_a + nb.avg_b) / 2), 6) AS margin
         |      FROM s JOIN na USING (id_a) JOIN nb USING (id_b))
         |SELECT id_a, id_b, sim, margin FROM m WHERE margin > 1.0
         |ORDER BY margin DESC, id_a, id_b LIMIT 10""".stripMargin,

    // Index-stats replay over the same dumped codes the Spark side read.
    "ivf_index_stats" ->
      s"""WITH c AS (SELECT cell::INT AS cell, count(*) AS n_vecs
         |           FROM read_parquet('__IVFPQRES_CODES__/*/*.parquet', hive_partitioning=true)
         |           GROUP BY 1),
         |t AS (SELECT sum(n_vecs) AS tot FROM c)
         |SELECT c.cell, c.n_vecs, round(c.n_vecs::DOUBLE / t.tot, 6) AS share
         |FROM c CROSS JOIN t ORDER BY c.cell""".stripMargin,

    // Metadata-filtered exact search: the same brute-force ranking
    // restricted to ids whose document row passes the predicate.
    "knn_filtered" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |  AND e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
         |ORDER BY sim DESC, e.vec_id ASC
         |LIMIT 10""".stripMargin,

    // Filtered-IVFADC replay: the allowed-id predicate lands on the codes
    // CTE — i.e. BEFORE the shortlist window — mirroring the pre-filter
    // semi-join in Ivfpq.searchResidual(filterIds = ...).
    "ivfpq_res_filtered" ->
      s"""WITH ${duckResShortCtes(duckProbe3Where() +
             "\n          AND vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')")},
         |rer AS (SELECT n.vec_id, round(${duckCosine("n.nemb", "qn.qn")}, 6) AS sim
         |        FROM nemb n CROSS JOIN qn)
         |SELECT vec_id, sim FROM rer ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin,

    // Tombstone replay: the Spark side served a cloned layout with ids
    // 1 and 2 tombstoned; the clone is byte-identical to the pristine
    // dumped codes, so the replay is the same scan minus those ids.
    "ivfpq_res_deleted" ->
      s"""WITH ${duckResShortCtes(duckProbe3Where() + " AND vec_id NOT IN (1, 2)")},
         |rer AS (SELECT n.vec_id, round(${duckCosine("n.nemb", "qn.qn")}, 6) AS sim
         |        FROM nemb n CROSS JOIN qn)
         |SELECT vec_id, sim FROM rer ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin,

    // Split replay: the identical probe + anchor-ADC + rescore chain, but
    // every index half comes from the SPLIT layout's own dumps — centers
    // with the two sub-centers, anchors with the two sub-cell means,
    // codes re-encoded for the split cell. Nothing about the split is
    // trusted: the oracle recomputes the served ranking from the dumped
    // artifacts alone.
    "ivfpq_res_split" ->
      s"""WITH ${duckResShortCtes(duckProbe3Where("__SPLIT_CENTS__"),
             anchorsGlob = "__SPLIT_ANCHORS__", codesGlob = "__SPLIT_CODES__")},
         |rer AS (SELECT n.vec_id, round(${duckCosine("n.nemb", "qn.qn")}, 6) AS sim
         |        FROM nemb n CROSS JOIN qn)
         |SELECT vec_id, sim FROM rer ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin,

    // Batch-IVFADC replay: per qid, probe over the dumped centers, ADC
    // over the dumped residual books + anchors + codes, TopKPerKey-
    // equivalent shortlist window, exact rescore — mirroring
    // Ivfpq.searchBatchResidual's arithmetic operation for operation.
    "ivfpq_res_batch" ->
      s"""WITH books AS (SELECT s, code, cent::DOUBLE[] AS cent
         |          FROM read_parquet('__PQRES_BOOKS__/*.parquet')),
         |qs AS (SELECT vec_id AS qid, list_transform(embedding::DOUBLE[],
         |         x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS qn
         |       FROM embeddings WHERE vec_id < 3),
         |cents AS (SELECT cell, centroid::DOUBLE[] AS cent
         |          FROM read_parquet('__IVFKM_CENTS__/*.parquet')),
         |anchors AS (SELECT cell, anchor::DOUBLE[] AS anchor
         |            FROM read_parquet('__PQRES_ANCHORS__/*.parquet')),
         |probe AS (SELECT qid, cell FROM (
         |    SELECT q.qid, c.cell, row_number() OVER (PARTITION BY q.qid
         |      ORDER BY round(${duckCosine("c.cent", "q.qn")}, 6) DESC, c.cell ASC) AS rn
         |    FROM qs q CROSS JOIN cents c) WHERE rn <= 3),
         |qc AS (SELECT q.qid, a.cell, list_dot_product(a.anchor, q.qn) AS qdotc
         |       FROM qs q CROSS JOIN anchors a),
         |adc AS (SELECT q.qid, b.s, b.code,
         |          list_dot_product(b.cent, list_slice(q.qn, b.s*8+1, b.s*8+8)) AS dot
         |        FROM books b CROSS JOIN qs q),
         |cand AS (SELECT p.qid, c.vec_id, c.cell, c.codes
         |         FROM read_parquet('__IVFPQRES_CODES__/*/*.parquet', hive_partitioning=true) c
         |         JOIN probe p ON p.cell = c.cell
         |         WHERE c.vec_id <> p.qid),
         |scored AS (SELECT cand.qid, cand.vec_id,
         |    round(qc.qdotc + list_reduce(list_prepend(0.0::DOUBLE, list(a.dot ORDER BY a.s)),
         |      (acc, x) -> acc + x), 6) AS adcs
         |  FROM cand
         |  JOIN qc ON qc.qid = cand.qid AND qc.cell = cand.cell
         |  CROSS JOIN generate_series(0, 7) g(s)
         |  JOIN adc a ON a.qid = cand.qid AND a.s = g.s AND a.code = cand.codes[g.s + 1]
         |  GROUP BY cand.qid, cand.vec_id, qc.qdotc),
         |short AS (SELECT qid, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY adcs DESC, vec_id ASC) AS rn FROM scored) WHERE rn <= 20),
         |nemb AS (SELECT e.vec_id,
         |    list_transform(e.embedding::DOUBLE[], x -> x
         |      / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS nemb
         |  FROM embeddings e JOIN (SELECT DISTINCT vec_id FROM short) sv USING (vec_id)),
         |rer AS (SELECT s.qid, s.vec_id,
         |    round(${duckCosine("n.nemb", "q.qn")}, 6) AS sim
         |  FROM short s JOIN nemb n USING (vec_id) JOIN qs q ON q.qid = s.qid)
         |SELECT qid, vec_id, sim, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY sim DESC, vec_id ASC) AS rnk FROM rer)
         |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,

    "ivfpq_res_rerank_recall" ->
      s"""WITH ${duckResShortCtes(duckProbe3Where())},
         |rerank AS (SELECT n.vec_id FROM nemb n CROSS JOIN qn
         |  ORDER BY round(${duckCosine("n.nemb", "qn.qn")}, 6) DESC, n.vec_id ASC
         |  LIMIT 5)
         |SELECT 10 AS cells, 3 AS nprobe, 8 AS m, 16 AS k_codes, 20 AS shortlist,
         |  5 AS k, count(*)::BIGINT AS n_hit,
         |  round(count(*)::DOUBLE / 5.0, 6) AS recall
         |FROM rerank
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = rerank.vec_id)""".stripMargin,

    "retrieval_mrr" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe, label AS q_label
         |           FROM embeddings WHERE vec_id < 5),
         |lc AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY label),
         |scored AS (
         |  SELECT q.qid, q.q_label, e.vec_id, e.label,
         |    round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM scored),
         |top AS (
         |  SELECT qid, q_label, rnk,
         |    CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel,
         |    CASE WHEN label = q_label THEN 1.0 / (ln(rnk + 1.0) / ln(2.0))
         |         ELSE 0.0 END AS term
         |  FROM ranked WHERE rnk <= 10),
         |aggd AS (
         |  SELECT qid, q_label,
         |    max(CASE WHEN rel = 1 THEN 1.0 / rnk ELSE 0.0 END) AS mrr0,
         |    list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY rnk)),
         |      (acc, x) -> acc + x) AS dcg,
         |    sum(rel)::BIGINT AS n_rel_10
         |  FROM top GROUP BY qid, q_label)
         |SELECT a.qid, a.n_rel_10, round(a.mrr0, 6) AS mrr,
         |  round(CASE WHEN lc.n_label > 1 THEN
         |    a.dcg / list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1, greatest(least(lc.n_label - 1, 10), 1)),
         |        i -> 1.0 / (ln(i + 1.0) / ln(2.0)))), (acc, x) -> acc + x)
         |  ELSE 0.0 END, 6) AS ndcg10
         |FROM aggd a JOIN lc ON lc.label = a.q_label
         |ORDER BY qid""".stripMargin,

    // PQ-alone: ADC over every cell of the stored codes table; rescore
    // mirrors the Spark query's cosine(nemb, RAW q).
    "pq_rerank_recall" ->
      s"""WITH ${duckPqShortCtes("")},
         |rerank AS (SELECT n.vec_id FROM nemb n CROSS JOIN q
         |  ORDER BY round(${duckCosine("n.nemb", "q.qe")}, 6) DESC, n.vec_id ASC
         |  LIMIT 5)
         |SELECT 8 AS m, 16 AS k_codes, 20 AS shortlist, 5 AS k,
         |  count(*)::BIGINT AS n_hit, round(count(*)::DOUBLE / 5.0, 6) AS recall
         |FROM rerank
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = rerank.vec_id)""".stripMargin,

    // IVFPQ: same replay restricted to the nprobe=3 probed cells (probe
    // replayed over the dumped centers); rescore mirrors Ivfpq.search's
    // cosine(nemb, NORMALIZED q).
    "ivfpq_rerank_recall" ->
      s"""WITH ${duckPqShortCtes(duckProbe3Where())},
         |rerank AS (SELECT n.vec_id FROM nemb n CROSS JOIN qn
         |  ORDER BY round(${duckCosine("n.nemb", "qn.qn")}, 6) DESC, n.vec_id ASC
         |  LIMIT 5)
         |SELECT 10 AS cells, 3 AS nprobe, 8 AS m, 16 AS k_codes, 20 AS shortlist,
         |  5 AS k, count(*)::BIGINT AS n_hit,
         |  round(count(*)::DOUBLE / 5.0, 6) AS recall
         |FROM rerank
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = rerank.vec_id)""".stripMargin,

    "knn_topk" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |ORDER BY sim DESC, e.vec_id ASC
         |LIMIT 5""".stripMargin,

    "knn_topk_fused" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |ORDER BY sim DESC, e.vec_id ASC
         |LIMIT 5""".stripMargin,

    // Oracle reads the parquet the Derby store was loaded from; the Spark
    // side goes through JDBC + JSON decode. Identical results ⇔ lossless
    // round-trip (float → shortest JSON → float).
    "jdbc_knn" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |ORDER BY sim DESC, e.vec_id ASC
         |LIMIT 5""".stripMargin,

    "knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
         |           FROM embeddings WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.qid, e.vec_id, e.label,
         |    round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id >= 3),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM scored)
         |SELECT qid, vec_id, label, sim, rnk FROM ranked
         |WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin,

    // identical semantics through the custom TopKPerKey physical operator
    "knn_batch_custom" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
         |           FROM embeddings WHERE vec_id < 3),
         |scored AS (
         |  SELECT q.qid, e.vec_id, e.label,
         |    round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id >= 3),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rnk
         |  FROM scored)
         |SELECT qid, vec_id, label, sim, rnk FROM ranked
         |WHERE rnk <= 3
         |ORDER BY qid, rnk""".stripMargin,

    "search_threshold" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label,
         |  round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) AS sim
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id <> 0
         |  AND round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) >= 0.2
         |ORDER BY sim DESC, e.vec_id ASC
         |LIMIT 50""".stripMargin,

    "pairwise_sim" ->
      s"""SELECT round(${duckCosine("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")}, 6) AS sim
         |FROM embeddings a CROSS JOIN embeddings b
         |WHERE a.vec_id = 0 AND b.vec_id = 1""".stripMargin,

    "text_pairwise_sim" ->
      s"""WITH ${duckEmbedCte("'query: ' || d0.text", "WHERE d0.doc_id IN (0, 1)")}
         |SELECT round(sum(a.weight * b.weight), 6) AS sim
         |FROM emb a JOIN emb b USING (bucket)
         |WHERE a.doc_id = 0 AND b.doc_id = 1""".stripMargin,

    "quantize_embeddings" ->
      """WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS d FROM embeddings),
        |s AS (SELECT vec_id, d, list_min(d) AS lo, list_max(d) AS hi,
        |        (list_max(d) - list_min(d)) / 255.0 AS scale FROM d),
        |c AS (SELECT vec_id, d, lo, hi, scale,
        |        CASE WHEN hi = lo THEN list_transform(d, x -> 0::BIGINT)
        |             ELSE list_transform(d, x -> round((x - lo) / scale)::BIGINT)
        |        END AS codes
        |      FROM s)
        |SELECT vec_id, len(d) AS dim, round(lo, 6) AS lo, round(hi, 6) AS hi,
        |  list_sum(codes)::BIGINT AS code_sum,
        |  list_max(codes)::BIGINT AS code_max,
        |  round(list_max(list_transform(generate_series(1, len(d)),
        |    i -> abs(d[i] - (lo + codes[i] * scale)))), 6) AS max_abs_err
        |FROM c ORDER BY vec_id""".stripMargin,

    "ann_recall" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |exact AS (
         |  SELECT e.vec_id FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
         |    e.vec_id ASC
         |  LIMIT 5),
         |m AS (SELECT label, min(vec_id) AS mv FROM embeddings GROUP BY label),
         |cents AS (SELECT e.label AS cell, e.embedding::DOUBLE[] AS ce
         |          FROM embeddings e JOIN m ON e.vec_id = m.mv),
         |probe AS (
         |  SELECT cell FROM cents CROSS JOIN q
         |  ORDER BY round(${duckCosine("ce", "qe")}, 6) DESC, cell ASC
         |  LIMIT 1),
         |approx AS (
         |  SELECT e.vec_id
         |  FROM embeddings e CROSS JOIN q JOIN probe p ON e.label = p.cell
         |  WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
         |    e.vec_id ASC
         |  LIMIT 5)
         |SELECT 0::BIGINT AS qid, 5 AS k, count(*)::BIGINT AS n_hit,
         |  round(count(*)::DOUBLE / 5.0, 6) AS recall
         |FROM approx
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = approx.vec_id)""".stripMargin,

    "centroid_by_label" ->
      """SELECT e.label, g.i - 1 AS pos,
        |  round(avg(e.embedding[g.i]::DOUBLE), 6) AS val
        |FROM embeddings e
        |CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        |GROUP BY e.label, g.i
        |ORDER BY label, pos""".stripMargin,

    "vector_mean" ->
      """SELECT e.label, g.i - 1 AS pos,
        |  round(avg(e.embedding[g.i]::DOUBLE), 6) AS val
        |FROM embeddings e
        |CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        |GROUP BY e.label, g.i
        |ORDER BY label, pos""".stripMargin,

    "all_documents" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "doc_count" ->
      "SELECT count(*) AS total_documents FROM documents",

    "prepare_documents" ->
      s"""WITH ${duckEmbedCte("'passage: ' || d0.source || ' : ' || d0.text")}
         |SELECT d.doc_id, d.source || ' : ' || d.text AS combined_text,
         |  64 AS embedding_dimensions,
         |  round(sqrt(sum(e.weight * e.weight)), 6) AS emb_norm
         |FROM emb e JOIN documents d USING (doc_id)
         |GROUP BY d.doc_id, combined_text
         |ORDER BY d.doc_id""".stripMargin,

    "mrl_recall" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |exact AS (
         |  SELECT e.vec_id FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
         |    e.vec_id ASC
         |  LIMIT 5),
         |short AS (
         |  SELECT e.vec_id, e.embedding::DOUBLE[] AS emb
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("list_slice(e.embedding::DOUBLE[], 1, 32)",
                                        "list_slice(q.qe, 1, 32)")}, 6) DESC,
         |    e.vec_id ASC
         |  LIMIT 20),
         |rr AS (
         |  SELECT s.vec_id FROM short s CROSS JOIN q
         |  ORDER BY round(${duckCosine("s.emb", "q.qe")}, 6) DESC, s.vec_id ASC
         |  LIMIT 5)
         |SELECT 32 AS trunc_dim, 20 AS shortlist, 5 AS k,
         |  count(*)::BIGINT AS n_hit, round(count(*) / 5.0, 6) AS recall
         |FROM rr
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = rr.vec_id)""".stripMargin,

    "bq_rerank_recall" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
         |exact AS (
         |  SELECT e.vec_id FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> 0
         |  ORDER BY round(${duckCosine("e.embedding::DOUBLE[]", "q.qe")}, 6) DESC,
         |    e.vec_id ASC
         |  LIMIT 5),
         |short AS (
         |  SELECT e.vec_id, e.embedding::DOUBLE[] AS emb
         |  FROM embeddings e CROSS JOIN q
         |  WHERE e.vec_id <> 0
         |  ORDER BY len(list_filter(
         |      list_transform(generate_series(1, 64),
         |        i -> (e.embedding[i] > 0) = (q.qe[i] > 0)),
         |      v -> v)) DESC,
         |    e.vec_id ASC
         |  LIMIT 20),
         |rr AS (
         |  SELECT s.vec_id FROM short s CROSS JOIN q
         |  ORDER BY round(${duckCosine("s.emb", "q.qe")}, 6) DESC, s.vec_id ASC
         |  LIMIT 5)
         |SELECT 64 AS n_bits, 20 AS shortlist, 5 AS k,
         |  count(*)::BIGINT AS n_hit, round(count(*) / 5.0, 6) AS recall
         |FROM rr
         |WHERE EXISTS (SELECT 1 FROM exact WHERE exact.vec_id = rr.vec_id)""".stripMargin,

    "embed_documents" ->
      s"""WITH ${duckEmbedCte("'passage: ' || d0.text")}
         |SELECT doc_id, bucket, round(weight, 6) AS weight
         |FROM emb
         |ORDER BY doc_id, bucket""".stripMargin,

    "embed_batched" ->
      s"""WITH ${duckEmbedCte("'passage: ' || d0.text")}
         |SELECT doc_id, bucket, round(weight, 6) AS weight
         |FROM emb
         |ORDER BY doc_id, bucket""".stripMargin,

    "mmr_rerank" -> graft.operators.Mmr.oracleSql(
      qId = 0L, k = 5, shortlistN = 20, lam = 0.7, mu = 0.3, duckCosine)
  )
}
