package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the plan
  * hygiene audit: filters pushed to the scan, pruned read schemas,
  * broadcast vs shuffle join choices, TakeOrderedAndProject for top-k,
  * whole-stage codegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // same extensions as Verify/Bench — without them the custom
      // strategies (TopKPerKeyPlan, IVF rewrite) have no physical plan
      // and the audit dies with "No plan for"
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "knn_topk_fused", "q1_agg", "q3_top10", "q5_nation_revenue",
      "semi_join", "embedding_neardup", "dedup_exact", "minhash_lsh_dedup",
      "ann_ivf", "embed_documents", "topk_orders", "asof_join",
      // round-3 representatives
      "hybrid_rrf", "pagerank_pairs", "knn_batch_custom", "ann_ivf_kmeans",
      "sentence_dedup", "winnow_dedup", "sql_udf", "lateral_topn",
      // round-5 representatives
      "ivfpq_rerank_recall", "pq_rerank_recall", "triangle_count",
      "merge_upsert", "cohort_retention", "zscore_features", "image_phash_neardup",
      // round-6 representatives
      "substring_dedup", "heavy_hitters", "dq_checks", "interval_join_fouter",
      // round-7 representatives
      "semantic_dedup", "dv_mor_read", "tt_read_latest", "mmr_rerank",
      "cms_heavy_probes", "unigram_tokenize")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
