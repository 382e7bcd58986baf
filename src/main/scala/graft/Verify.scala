package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // tolerate extra args instead of a MatchError; only the first two matter
    require(args.length >= 2, "usage: graft.Verify <sfDir> <outDir>")
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional local-iteration filter (comma-separated query names); the
    // driver sets no filter and dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracleSelected = only match {
      case Some(names) => SparkEntry.oracleSql.filter { case (n, _) => names(n) }
      case None        => SparkEntry.oracleSql
    }
    // The trained-IVF oracles probe the SAME dumped index files the Spark
    // queries searched; those paths depend on the sf dir, which only this
    // main knows — resolve the placeholders before handing the SQL to the
    // driver's DuckDB run.
    val pathSubs = Seq(
      "__IVFKM_LAYOUT__" -> graft.operators.Ann.kmeansLayoutPath(sfDir),
      "__IVFKM_CENTS__"  -> graft.operators.Ann.kmeansCentsPath(sfDir),
      "__PQ_BOOKS__"     -> graft.operators.Pq.booksPath(sfDir),
      "__PQRES_BOOKS__"  -> graft.operators.Pq.resBooksPath(sfDir),
      "__PQRES_ANCHORS__" -> graft.operators.Pq.resAnchorsPath(sfDir),
      "__IVFPQ_CODES__"  -> graft.operators.Ivfpq.codesPath(sfDir),
      "__IVFPQRES_CODES__" -> graft.operators.Ivfpq.resCodesPath(sfDir),
      // the split demo's caller-owned clone dumps its own metadata halves
      // beside itself (Ivfpq.splitCell step 5)
      "__SPLIT_CODES__"   -> (graft.operators.Ivfpq.resCodesPath(sfDir) + "-split-demo"),
      "__SPLIT_CENTS__"   -> (graft.operators.Ivfpq.resCodesPath(sfDir) + "-split-demo-cents"),
      "__SPLIT_ANCHORS__" -> (graft.operators.Ivfpq.resCodesPath(sfDir) + "-split-demo-anchors"),
      "__KLL_ITEMS__"    -> graft.operators.Kll.itemsPath(sfDir),
      "__KLL_META__"     -> graft.operators.Kll.metaPath(sfDir),
      "__HNSW_RWCORPUS__" -> graft.operators.Hnsw.rewriteCorpusPath(sfDir),
      // the durable catalog's CURRENT manifest version — resolved here,
      // after the queries ran (index_catalog_reload published it)
      "__IDXCAT_MANIFEST__" -> graft.plans.IndexCatalog.latestManifestDir(
        spark, graft.plans.IndexCatalog.manifestRoot(sfDir)),
      "__MV_SRC__"       -> graft.plans.MvDemo.srcPath(sfDir),
      "__IVFKM_RADII__"  -> graft.operators.Ann.kmRadiiPath(sfDir),
      "__HNSW_EDGES__"   -> graft.operators.Hnsw.edgesPath(sfDir),
      "__HNSW_META__"    -> graft.operators.Hnsw.metaPath(sfDir),
      "__HNSW_ADAPT__"   -> graft.operators.Hnsw.adaptPath(sfDir),
      "__HNSW_PQEDGES__" -> graft.operators.Hnsw.pqEdgesPath(sfDir),
      "__PQ_BOOKS64__"   -> graft.operators.Pq.booksPath(sfDir, k = graft.operators.Hnsw.PqCodesK),
      "__IVFPQ_CODES64__" -> graft.operators.Ivfpq.codesPath(sfDir, k = graft.operators.Hnsw.PqCodesK),
      // the maintenance demo's caller-owned clone + its sidecars (paths
      // are pure functions of sfDir — maintDemoLayout dumps them all)
      "__HNSW_MAINT_EDGES__"    -> graft.operators.Hnsw.maintDemoEdgesPath(sfDir),
      "__HNSW_MAINT_META__"     -> graft.operators.Hnsw.maintDemoMetaPath(sfDir),
      "__HNSW_MAINT_DELTA__"    -> graft.operators.Hnsw.deltaPath(graft.operators.Hnsw.maintDemoEdgesPath(sfDir)),
      "__HNSW_MAINT_REPLACED__" -> graft.operators.Hnsw.replacedPath(graft.operators.Hnsw.maintDemoEdgesPath(sfDir)),
      "__HNSW_MAINT_TOMB__"     -> graft.operators.Hnsw.tombstonesPath(graft.operators.Hnsw.maintDemoEdgesPath(sfDir)),
      "__HNSW_MAINT_SHARDS__"   -> graft.operators.Hnsw.shardsPath(graft.operators.Hnsw.maintDemoEdgesPath(sfDir)),
      "__INVIDX_MAINT__"      -> graft.operators.InvertedIndex.maintDemoPath(sfDir),
      "__INVIDX_MAINT_TOMB__" -> graft.operators.InvertedIndex.tombstonesPath(
        graft.operators.InvertedIndex.maintDemoPath(sfDir)),
      "__LSH_LAYOUT__"   -> graft.operators.MlAnn.lshLayoutPath(sfDir),
      "__TF_BUCKETS__"   -> graft.operators.MlAnn.tfBucketsPath(sfDir),
      "__DV_DATA__"      -> (graft.operators.DeletionVectors.layoutPath(sfDir) + "/data"),
      "__DV_DELETES__"   -> (graft.operators.DeletionVectors.layoutPath(sfDir) + "/deletes"),
      "__DVC_DATA__"     -> (graft.operators.DeletionVectors.compactedLayoutPath(sfDir) + "/data"),
      "__DVC_DELETES__"  -> (graft.operators.DeletionVectors.compactedLayoutPath(sfDir) + "/deletes"),
      "__UNI_VOCAB__"    -> graft.operators.Unigram.vocabPath(sfDir),
      "__PCA_MODEL__"    -> graft.operators.Pca.modelPath(sfDir),
      "__LOGREG_W__"     -> graft.operators.LogReg.weightsPath(sfDir),
      "__LOGREG_TRACE__" -> graft.operators.LogReg.tracePath(sfDir),
      "__LOGREG_CAL__"   -> graft.operators.LogReg.calibPath(sfDir),
      "__TT_FILES__"     -> (graft.operators.TxnLog.layoutPath(sfDir) + "/files"),
      "__TT_DELETES__"   -> (graft.operators.TxnLog.layoutPath(sfDir) + "/deletes"),
      "__TT_MANIFESTS__" -> (graft.operators.TxnLog.layoutPath(sfDir) + "/manifests"),
      "__TTO_FILES__"    -> (graft.operators.TxnLog.optimizeLayoutPath(sfDir) + "/files"),
      "__TTO_DELETES__"  -> (graft.operators.TxnLog.optimizeLayoutPath(sfDir) + "/deletes"),
      "__TTO_MANIFESTS__" -> (graft.operators.TxnLog.optimizeLayoutPath(sfDir) + "/manifests"),
      "__TTM_MANIFESTS__" -> (graft.operators.TxnLog.multiLayoutPath(sfDir) + "/manifests"),
      "__TTM_POST__"     -> (graft.operators.TxnLog.multiLayoutPath(sfDir) + "/files/postings"),
      "__TTM_META__"     -> (graft.operators.TxnLog.multiLayoutPath(sfDir) + "/files/meta"),
      "__CONFORMAL_M__"  -> graft.operators.Conformal.modelPath(sfDir),
      "__WORDVEC__"      -> graft.operators.WordVec.vectorsPath(sfDir),
      "__WORDANN__"      -> graft.operators.WordVec.annPath(sfDir),
      "__WORDANN_CENTS__" -> graft.operators.WordVec.annCentsPath(sfDir),
      "__QREG__"         -> graft.operators.QuantileReg.modelPath(sfDir),
      "__LOGREG_CV__"    -> graft.operators.LogReg.cvPath(sfDir),
      "__LANGID_W__"     -> graft.operators.LangId.modelPath(sfDir),
      "__TTX_FILES__"     -> (graft.operators.TxnLog.maintLayoutPath(sfDir) + "/files"),
      "__TTX_DELETES__"   -> (graft.operators.TxnLog.maintLayoutPath(sfDir) + "/deletes"),
      "__TTX_MANIFESTS__" -> (graft.operators.TxnLog.maintLayoutPath(sfDir) + "/manifests"),
      "__TTX_CHECKPOINTS__" -> (graft.operators.TxnLog.maintLayoutPath(sfDir) + "/checkpoints"),
      "__TTE_FILES__"    -> (graft.operators.TxnLog.evoLayoutPath(sfDir) + "/files"),
      "__TTE_DELETES__"  -> (graft.operators.TxnLog.evoLayoutPath(sfDir) + "/deletes"),
      "__TTE_MANIFESTS__" -> (graft.operators.TxnLog.evoLayoutPath(sfDir) + "/manifests"))
    val json = oracleSelected
      .map { case (k, v) =>
        val resolved = pathSubs.foldLeft(v) { case (sql, (tok, path)) =>
          sql.replace(tok, path)
        }
        s"${q(k)}: ${q(resolved)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
