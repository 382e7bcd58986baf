package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timer for stage builders (round-14 optimization, not part of
  * the bench contract): cold-builds the named stages (all when no args)
  * exactly like Bench's timeStages and prints seconds per stage.
  */
object TimeStages {
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
    graft.Tables.region(spark, sfDir).count()
    val want = args.toSet
    val picked = graft.Stages.all.filter { case (n, _) =>
      want.isEmpty || want(n) }
    (1 to 2).foreach { pass =>
      graft.Stages.resetAll(spark)
      picked.foreach { case (n, b) =>
        val t0 = System.nanoTime()
        b(spark, sfDir)
        println(f"STAGE pass$pass ${(System.nanoTime() - t0) / 1e9}%7.3f  $n")
      }
    }
    spark.stop()
  }
}
