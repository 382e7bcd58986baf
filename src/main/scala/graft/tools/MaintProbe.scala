package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase-timer for the HNSW maintenance demo build (round-15):
  * replays maintDemoLayout's phases with individual timers so the
  * driver-side gaps (7s wall vs 3.7s of job time) attribute to a phase.
  */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    import graft.operators.Hnsw
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE ${(System.nanoTime() - t0) / 1e9}%7.3f  $label")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      t("layout (memo warm on pass2)")(Hnsw.layout(spark, sfDir))
      val de = Hnsw.maintDemoEdgesPath(sfDir) + "-probe"
      val dm = Hnsw.maintDemoMetaPath(sfDir) + "-probe"
      val conf = spark.sessionState.newHadoopConf()
      t("sidecar deletes") {
        Seq(Hnsw.deltaPath(de), Hnsw.replacedPath(de), Hnsw.tombstonesPath(de))
          .foreach { d =>
            val p = new org.apache.hadoop.fs.Path(d)
            p.getFileSystem(conf).delete(p, true)
          }
      }
      t("fs copies") {
        Hnsw.fsCopy(spark, Hnsw.edgesPath(sfDir), de)
        Hnsw.fsCopy(spark, Hnsw.shardsPath(Hnsw.edgesPath(sfDir)), Hnsw.shardsPath(de))
        Hnsw.fsCopy(spark, Hnsw.metaPath(sfDir), dm)
      }
      val emb = graft.Tables.embeddings(spark, sfDir)
      val nv = t("new-vec frame") {
        emb.filter(col("vec_id") === 5).select(col("embedding").as("__ea"))
          .crossJoin(emb.filter(col("vec_id") === 9).select(col("embedding").as("__eb")))
          .select(lit(Hnsw.AppendedId).as("vec_id"),
            graft.functions.VectorOps.l2Normalize(
              zip_with(col("__ea"), col("__eb"),
                (x, y) => (x + y) / lit(2.0))).cast("array<float>").as("embedding"))
      }
      t("appendToGraph")(Hnsw.appendToGraph(spark, sfDir, de, dm, nv))
      val q0 = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("qid"), col("embedding").as("q_emb"))
      val top1 = t("searchIn top1")(Hnsw.searchIn(spark, de, dm, q0, k = 1)
        .head().getLong(1))
      t("deleteFromGraph")(Hnsw.deleteFromGraph(spark, de, dm, Seq(top1)))
    }
    spark.stop()
  }
}
