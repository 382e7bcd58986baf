package graft

import org.apache.spark.sql.SparkSession

/** Registry of every one-time staged build (StageCache memos, IVF/PQ index
  * builds, the Derby store) so the bench harness can pre-build each one,
  * timed, as an explicit `stage:*` line item — instead of the build cost
  * landing on whichever query happens to touch the memo first (round-4
  * verdict: `dedup_components` carried the whole LSH-pairs build while
  * `minhash_lsh_dedup` measured 0.04 s; neither number was the truth).
  *
  * Each entry forces the build eagerly: StageCache entries localCheckpoint
  * (an action) on first use; the index builds write parquet / fit models.
  */
object Stages {

  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "lsh-pairs"    -> ((s, d) => { queries.PipelineQueries.lshVerifiedPairs(s, d); () }),
    "cooc-edges"   -> ((s, d) => { queries.PipelineQueries.stagedCoocEdges(s, d); () }),
    "tri-corners"  -> ((s, d) => { queries.PipelineQueries.stagedTriCorners(s, d); () }),
    "phash-bands"  -> ((s, d) => { queries.PipelineQueries.stagedPhashBands(s, d); () }),
    "shingles"     -> ((s, d) => { queries.TrainQueries.stagedShingles(s, d); () }),
    "bm25-tf"      -> ((s, d) => { queries.TextQueries.bm25Tf(s, d); () }),
    "winnow-fps"   -> ((s, d) => { queries.TextQueries.stagedWinnowFps(s, d); () }),
    "doc-toks"     -> ((s, d) => { queries.TextQueries.stagedDocToks(s, d); () }),
    "char-hist"    -> ((s, d) => { queries.TextQueries.stagedCharHist(s, d); () }),
    "sentence-fps" -> ((s, d) => { queries.TextQueries.stagedSentenceFps(s, d); () }),
    "bigrams"      -> ((s, d) => { queries.TextQueries.stagedBigrams(s, d); () }),
    "ivf-layout"   -> ((s, d) => { operators.Ann.ivfLayout(s, d); () }),
    "ivfkm-layout" -> ((s, d) => { operators.Ann.kmeansLayout(s, d); () }),
    "ivfkm-radii"  -> ((s, d) => { operators.Ann.kmRadiiLayout(s, d); () }),
    "pq-codebooks" -> ((s, d) => { operators.Pq.train(s, d); () }),
    "ivfpq-codes"  -> ((s, d) => { operators.Ivfpq.codesLayout(s, d); () }),
    "ivfpqres-codes" -> ((s, d) => { operators.Ivfpq.resCodesLayout(s, d); () }),
    "ivfpq-deldemo" -> ((s, d) => { operators.Ivfpq.deletedDemoLayout(s, d); () }),
    "ivfpq-splitdemo" -> ((s, d) => { operators.Ivfpq.splitDemoLayout(s, d); () }),
    "hnsw-graph"   -> ((s, d) => { operators.Hnsw.layout(s, d); () }),
    "hnsw-maintdemo" -> ((s, d) => { operators.Hnsw.maintDemoLayout(s, d); () }),
    "hnsw-pq"      -> ((s, d) => { operators.Hnsw.pqLayout(s, d); () }),
    "hnsw-rwcorpus" -> ((s, d) => { operators.Hnsw.rewriteCorpusLayout(s, d); () }),
    "kll-sketch"   -> ((s, d) => { operators.Kll.layout(s, d); () }),
    "lsh-layout"   -> ((s, d) => { operators.MlAnn.lshLayout(s, d); () }),
    "tf-buckets"   -> ((s, d) => { operators.MlAnn.tfBucketsLayout(s, d); () }),
    "jdbc-store"   -> ((s, d) => { sources.JdbcStore.ensureStore(s, d); () }),
    "skip-layout"  -> ((s, d) => { sources.SkipIndex.layout(s, d); () }),
    "bloom-layout" -> ((s, d) => { sources.BloomSkip.layout(s, d); () }),
    "invidx-layout" -> ((s, d) => { operators.InvertedIndex.layout(s, d); () }),
    "invidx-maintdemo" -> ((s, d) => { operators.InvertedIndex.maintDemoLayout(s, d); () }),
    "zorder-layout" -> ((s, d) => { sources.ZOrderSkip.layout(s, d); () }),
    "dv-layout"    -> ((s, d) => { operators.DeletionVectors.layout(s, d); () }),
    "dvc-layout"   -> ((s, d) => { operators.DeletionVectors.compactedLayout(s, d); () }),
    "uni-vocab"    -> ((s, d) => {
      operators.Unigram.vocabLayout(s, d, sp => queries.TextQueries.wordFreqs(sp, d)); () }),
    "txn-layout"   -> ((s, d) => { operators.TxnLog.layout(s, d); () }),
    "txn-opt-layout" -> ((s, d) => { operators.TxnLog.optimizeLayout(s, d); () }),
    "txn-multi-layout" -> ((s, d) => { operators.TxnLog.multiLayout(s, d); () }),
    "txn-evo-layout" -> ((s, d) => { operators.TxnLog.evoLayout(s, d); () }),
    "txn-maint-layout" -> ((s, d) => { operators.TxnLog.maintLayout(s, d); () }),
    "pca-model"    -> ((s, d) => { operators.Pca.model(s, d); () }),
    "wordvec-model" -> ((s, d) => {
      operators.WordVec.model(s, d, sp => queries.TextQueries.stagedBigrams(sp, d)); () }),
    "wordann-layout" -> ((s, d) => {
      operators.WordVec.annLayout(s, d, sp => queries.TextQueries.stagedBigrams(sp, d)); () }),
    "qreg-model"   -> ((s, d) => { operators.QuantileReg.model(s, d); () }),
    "logreg-model" -> ((s, d) => { operators.LogReg.model(s, d); () }),
    "logreg-calib" -> ((s, d) => { operators.LogReg.calibration(s, d); () }),
    "logreg-cv"    -> ((s, d) => { operators.LogReg.cvModel(s, d); () }),
    "langid-model" -> ((s, d) => { operators.LangId.model(s, d); () }),
    "conformal-model" -> ((s, d) => { operators.Conformal.model(s, d); () }),
    "mv-layout"    -> ((s, d) => { plans.MvDemo.ensure(s, d); () })
  )

  /** Forget every one-time-build memo (JVM maps + staged checkpoints) so
    * the bench harness can time a SECOND, equally-cold build of every
    * `stage:*` item. A single-shot stage timing cannot distinguish a
    * scheduler hiccup from a regression (round-5 verdict: the driver box
    * recorded `stage:bm25-tf` at 31.2 s where an idle box measures 2.1 s —
    * and with one sample, 31.2 became the number of record). On-disk
    * outputs are rewritten in place: every build uses a deterministic path
    * and mode=overwrite, so queries running afterwards see the same index
    * contents either way.
    */
  def resetAll(spark: SparkSession): Unit = {
    StageCache.evict(spark)
    operators.Ann.resetMemos()
    operators.Pq.resetMemos()
    operators.Ivfpq.resetMemos()
    operators.MlAnn.resetMemos()
    operators.Hnsw.resetMemos()
    operators.Kll.resetMemos()
    operators.DeletionVectors.resetMemos()
    operators.Unigram.resetMemos()
    operators.TxnLog.resetMemos()
    operators.LangId.resetMemos()
    operators.InvertedIndex.resetMemos()
    sources.JdbcStore.resetMemos()
    sources.SkipIndex.resetMemos()
    sources.BloomSkip.resetMemos()
    sources.ZOrderSkip.resetMemos()
    operators.Pca.resetMemos()
    operators.WordVec.resetMemos()
    operators.QuantileReg.resetMemos()
    operators.LogReg.resetMemos()
    operators.Conformal.resetMemos()
    plans.MvDemo.resetMemos()
  }
}
