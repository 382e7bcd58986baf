package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch builder (round-15): builds the HNSW artifacts for the given sf
  * dirs and prints their dump locations, so old-vs-new build outputs can
  * be diffed offline (the equality check behind the pair-stage rewrite).
  */
object BuildHnsw {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { sfDir =>
      val e = graft.operators.Hnsw.layout(spark, sfDir)
      val (de, dm) = graft.operators.Hnsw.maintDemoLayout(spark, sfDir)
      val pq = graft.operators.Hnsw.pqLayout(spark, sfDir)
      println(s"BUILT $sfDir -> $e ; $de ; $dm ; $pq")
    }
    spark.stop()
  }
}
