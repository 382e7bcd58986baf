package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.operators.Ann

/** Scratch probe #2 (round-15): reproduces the REWRITTEN hnsw layer-0
  * pipeline exactly and prints plan + per-variant timings, to find the
  * residual single-task stage in the edges-write job.
  */
object HnswProbe2 {
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
    GraftFunctions.register(spark)
    spark.range(1 << 20).selectExpr("sum(id)").collect()

    val (ivfPath, cents) = Ann.kmeansLayout(spark, sfDir)
    val corpus = spark.read.parquet(ivfPath)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
    val staged = Ann.nearestCells(corpus,
        Ann.centroidsDf(spark, cents), "vec_id", "embedding", n = 2)
      .select(col("vec_id"), col("embedding"), col("cell").as("shard"))
      .repartition(spark.sparkContext.defaultParallelism, col("shard"))
      .localCheckpoint()
    println("parts=" + staged.rdd.getNumPartitions)

    val M = graft.operators.Hnsw.M
    val MaxDegree = graft.operators.Hnsw.MaxDegree
    def blockedPairs(nodes: DataFrame): DataFrame = {
      val a = nodes.select(col("shard"), col("vec_id").as("src"),
        col("embedding").as("ea"))
      val b = nodes.select(col("shard"), col("vec_id").as("dst"),
        col("embedding").as("eb"))
      val wLocal = Window.partitionBy(col("shard"), col("src"))
        .orderBy(col("sim").desc, col("dst").asc)
      a.join(b, Seq("shard"))
        .filter(col("src") =!= col("dst"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6))
        .select(col("shard"), col("src"), col("dst"), col("sim"))
        .withColumn("__lrn", row_number().over(wLocal))
        .filter(col("__lrn") <= M)
        .select(col("src"), col("dst"), col("sim"))
    }
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    def capEdges(pairs: DataFrame): DataFrame = {
      val out = pairs
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= M).select(col("src"), col("dst"), col("sim"))
      out.union(out.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= MaxDegree)
        .select(lit(0).as("layer"), col("src"), col("dst"))
    }
    def timeIt(label: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    timeIt("pairs-localtop")(blockedPairs(staged))
    timeIt("cap-over-localtop")(capEdges(blockedPairs(staged)))
    println(blockedPairs(staged).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
