package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan hygiene lint across the ENTIRE query registry: structural
  * scale-guards that must hold for every registered query's physical plan.
  * Catches regressions like an accidental non-broadcast cartesian product
  * or a driver-side collect sneaking into an operator — the class of bug
  * that passes correctness at sf0.01 and melts down at 100 TB.
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("no query plans a non-broadcast cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("unpartitioned windows appear only over digest-bounded inputs") {
    // `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels the
    // window's whole input through ONE task. Legitimate only when that
    // input is a bounded digest (a score-bin table, a top-k shortlist, a
    // vocabulary slice) — never the corpus. Every query that plans an
    // empty-partitionSpec Window must be allowlisted here WITH the bound
    // that justifies it; anything else is the classic silent 100 TB
    // single-task regression.
    val allowed = Map(
      "auc_score" -> "score-bin digest (score range / 0.1 bins)",
      "roc_curve" -> "score-bin digest (shared with auc_score)",
      "ts_decompose" -> "calendar-bounded daily digest",
      "acf_daily" -> "calendar-bounded daily digest (lag self-join index)",
      "global_rownum" -> "the ORACLE half only; the operator is the two-pass scheme",
      "hybrid_rrf" -> "top-k shortlists (≤k rows per ranker)",
      "hybrid_rrf_filtered" -> "top-k shortlists (≤k rows per ranker)",
      "bm25_search" -> "top-k shortlist rank",
      "mrl_recall" -> "20-row shortlist rank",
      "vocab_kl" -> "vocabulary digest",
      "vocab_coverage" -> "vocabulary digest",
      "bpe_merges" -> "vocabulary-bounded pair table",
      "bpe_pair_counts" -> "vocabulary-bounded pair table",
      "unigram_seed" -> "candidate-piece vocabulary slice",
      "weighted_sample" -> "50-row sample tail",
      "sql_surface" -> "demo over a LIMITed frame",
      "resample_fill" -> "calendar grid",
      "pmi_topk" -> "top-k pair digest",
      "heavy_hitters" -> "candidate digest (≤1/φ rows)",
      "value_histogram" -> "bin digest",
      "approx_topk_ops" -> "sketch candidate digest",
      "approx_topk_grouped" -> "sketch candidate digest",
      "active_users" -> "calendar-bounded daily digest (rolling WAU window)",
      "survival_curve" -> "duration digest (calendar-bounded KM windows)",
      "lorenz_curve" -> "per-customer revenue digest; scale path = the GlobalRowNum/Skyline two-pass prefix scheme",
      "period_over_period" -> "weeks digest (lag)",
      "charlm_bits" -> "36-row [a-z0-9] character model total",
      "skyline_parts" -> "cross-partition prefix max over ≤numPartitions AGGREGATED maxima (bytes of metadata; the corpus-facing window is __pid-partitioned)",
      "psi_drift" -> "nBins-row histogram frame (DataQuality.psiDrift)",
      "mann_whitney" -> "cumulative-weight window over the DISTINCT-value digest; production quantizes a continuous metric first (query comment)",
      "ks_test" -> "pooled-CDF cumulative window over the DISTINCT-value digest (the mann_whitney shape)",
      "msprt_monitor" -> "calendar-bounded daily digest (cumulative mixture-LR + running max)",
      "domain_reweight" -> "source-domain digest (≤ #sources rows; mixture normalizers)")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val hasGlobalWindow = q(spark, sf).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.nonEmpty
        if (hasGlobalWindow && !allowed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in un-allowlisted queries: ${offenders.mkString(", ")}")
  }

  test("every broadcast join in the registry builds the small side") {
    // BroadcastNestedLoopJoin is legitimate ONLY with a broadcast (tiny)
    // build side — which Spark guarantees by construction. This lint just
    // asserts BNLJ appears only in queries that intentionally stream the
    // corpus against a broadcast query/probe side.
    val allowed = Set("knn_topk", "knn_topk_fused", "knn_batch", "knn_batch_custom", "jdbc_knn",
      "search_threshold", "pairwise_sim", "text_pairwise_sim", "ngram_jaccard",
      "ann_ivf", "ann_ivf_nprobe", "ann_ivf_rewrite", "ann_recall", "ann_lsh",
      "mrl_recall", "bq_rerank_recall", "pq_rerank_recall", "ivfpq_rerank_recall", // 1-row query side broadcast, shortlist-and-rescore
      "ivfpq_res_rerank_recall", // same shape over the residual codes
      "ann_ivf_kmeans", "ann_recall_kmeans", "ann_ivf_batch", "ann_ivf_kmeans_batch",
      "ann_nprobe_sweep", // the recall replay at 3 nprobe settings — same 1-row query-side broadcasts as ann_recall_kmeans
      "ann_hnsw_recall", // exact-scan half: corpus vs 1-row broadcast query (the hnsw half is checkpoint-truncated beams)
      "ann_hnsw_filtered", // 1-row entry/query broadcasts into the visited-pool walk (beams checkpoint-truncated)
      "ann_stale_check", // two 1-row fingerprint digests compared
      "kll_quantiles", // sketch-frame × 4-percentile grid + events vs 4-row broadcast estimate audit
      "vocab_kl", // 1-row (V, N_old, N_new) and 1-row KL-total aggregates broadcast back into the digest frame
      "vocab_coverage", "q11_important_parts", "q17_avg_subquery", "q22_no_orders",
      "bm25_search",  // 1-row corpus-stats side broadcast into the scorer
      "hybrid_rrf",   // 1-row query-embedding + 1-row bm25-stats broadcasts
      "hybrid_rrf_filtered", // same shapes, corpus pre-restricted by the metadata semi-join
      "hll_sketch_ops", // 1-row merged-sketch × 1-row exact-count probe
      "pagerank_pairs", // 1-row node-count aggregate broadcast per iteration
      "textrank_keywords", // same PageRank 1-row count broadcast — visible in the final plan since the fixed-3-round loop went lazy (r15)
      "resample_fill",  // 1-row grid-bound aggregate broadcast into the grid generator
      "edit_distance_pairs", // 40-row blocked pair set, broadcast side
      "retrieval_mrr", // 5-row query panel broadcast against the corpus scan
      "pmi_topk", // 1-row total-count aggregate broadcast into the scorer
      "knn_filtered", // 1-row query side broadcast; corpus pre-restricted by the metadata semi-join
      "ivf_index_stats", // 1-row corpus-total aggregate broadcast into the share projection
      "heavy_hitters", // 1-row total-count aggregate broadcast into the φ threshold
      "knn_label_spread", // broadcast unlabeled query panel against the labeled scan
      "bitext_margin", // broadcast side-B panel; ANN candidates at scale (comment)
      "hard_negatives", // broadcast anchor panel against the corpus scan
      "roc_curve",    // 1-row (P, N) totals broadcast into the rate projection
      "benford_check", // 1-row total broadcast into the expectation arithmetic
      "bootstrap_ci", // 32-row replicate digest × 1-row point estimate
      "neg_samples",  // 1-row corpus-size digest broadcast into the hash draw
      "cluster_labels", // 1-row corpus-total broadcast into the lift score
      "decayed_counts", // 1-row reference-instant digest broadcast into the weights
      "kmv_distinct", // 1-row kth-hash × 1-row exact-count audit probe
      "kmv_set_ops",  // three 1-row sketch-algebra frames joined
      "two_proportion_z", // two 1-row per-arm digests joined
      "srm_check",    // two 1-row arm-size digests joined
      "chi2_independence", // 1-row grand total broadcast into the cell arithmetic
      "lorenz_curve", // 1-row totals broadcast into the share projection
      "anova_f",      // 1-row grand-mean digest joined into the group digest
      "survival_curve", // 1-row observation-end digest broadcast into censoring
      "acf_daily",    // 1-row moment digest broadcast into the lag products
      "column_profile", // per-column 1-row stats × 1-row mode frames
      "pca_project",  // broadcast model rows (k·d doubles) against the corpus scan
      "pca_variance", // 1-row retained-mass total broadcast into the share projection
      "pca_recall",   // 1-row query / projected-query broadcasts, shortlist-and-rescore
      "ab_welch",     // two 1-row per-arm moment digests joined
      "rfm_segments", // 1-row quintile-breakpoint aggregate broadcast into the scorer
      "assoc_rules",  // 1-row basket-total aggregate broadcast into the lift projection
      "cuped_adjust", // 1-row θ/mean/variance digests broadcast into the map-only adjust
      "msprt_monitor", // 1-row pooled-variance digest broadcast into the daily digest
      "power_mde",    // two 1-row per-arm moment digests joined (the ab_welch shape)
      "theil_sen",    // 30-row daily digest self-paired + 1-row median-slope broadcast
      "kneser_ney_bits", // 1-row (D, T) discount/total digest broadcast into the scorer
      "word_sim",     // 5-row probe panel broadcast against the vocab-sized vector table
      "rm3_expand",   // 1-row bm25-stats / feedback-weight-total broadcasts into the tf digest
      "domain_reweight", // 1-row bigram-type/token totals + source-count normalizers broadcast
      "selfjoin_size_est", // 1-row kth-hash threshold × 1-row exact-F2 audit probe
      "quantile_reg", // 2-row dumped-model broadcast against the table scan
      "lsh_recall_audit", // 1%-id panel broadcast against the corpus shingle scan
      "ks_test",      // 1-row per-arm totals broadcast into the CDF digest
      "tt_multi_idf", // 1-row meta sidecar broadcast into the idf projection
      "langid_accuracy", // 1-row majority-share digest broadcast beside the accuracy row
      "word_analogy",    // 3-row probe panel broadcast against centroid metadata
      "word_analogy_recall", // same probe panel, exact arm scans the vocab-sized table
      "ivf_range_search", // 1-row query vector broadcast against the cell-pruned scan
      "ann_hnsw_rewrite_batch", // 3-row query panel crossed with the ≤Ef·|panel|-id In-pruned scan
      "ivf_range_rewrite_batch", // 1-row query panel crossed with the union-of-admissions-pruned scan
      "ann_ivf_rewrite_batch", // 3-row query panel crossed with the union-of-probed-cells-pruned scan
      "ann_range_rewrite_batch") // 3-row query panel crossed with the union-of-visited-ids-pruned scan
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val plan = q(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin") && !allowed(name)) Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unexpected BroadcastNestedLoopJoin in: ${offenders.mkString(", ")}")
  }
}
