package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions
import graft.operators.Ann

/** Scratch micro-probe for the HNSW build (round-15 optimization, not in
  * the bench contract): times the layer-0 pair scoring and edge-capping
  * sub-plans in isolation, plus restructured variants, so the build
  * rewrite is driven by measured numbers (guide §1.1).
  */
object HnswProbe {
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
      .localCheckpoint()
    println("staged rows = " + staged.count() +
      " parts = " + staged.rdd.getNumPartitions)
    println(staged.groupBy(col("shard")).count().orderBy(col("count").desc)
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))

    def timeIt(label: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    def blockedPairs(nodes: DataFrame): DataFrame = {
      val a = nodes.select(col("shard"), col("vec_id").as("src"),
        col("embedding").as("ea"))
      val b = nodes.select(col("shard"), col("vec_id").as("dst"),
        col("embedding").as("eb"))
      a.join(b, Seq("shard"))
        .filter(col("src") =!= col("dst"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6))
        .select(col("src"), col("dst"), col("sim"))
    }
    val M = graft.operators.Hnsw.M
    val MaxDegree = graft.operators.Hnsw.MaxDegree
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("sim").desc, col("dst").asc)
    def capEdgesCur(pairs: DataFrame): DataFrame = {
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
    def capEdgesRepart(pairs: DataFrame): DataFrame = {
      val out = pairs.repartition(col("src"))
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= M).select(col("src"), col("dst"), col("sim"))
      out.union(out.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
        .repartition(col("src"))
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= MaxDegree)
        .select(lit(0).as("layer"), col("src"), col("dst"))
    }

    timeIt("pairs-only")(blockedPairs(staged))
    timeIt("cap-current")(capEdgesCur(blockedPairs(staged)))
    timeIt("cap-repart")(capEdgesRepart(blockedPairs(staged)))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
    timeIt("cap-current-4m")(capEdgesCur(blockedPairs(staged)))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    // per-shard local top-M before the exchange, then merge
    def capEdgesLocalTop(nodes: DataFrame): DataFrame = {
      val a = nodes.select(col("shard"), col("vec_id").as("src"),
        col("embedding").as("ea"))
      val b = nodes.select(col("shard"), col("vec_id").as("dst"),
        col("embedding").as("eb"))
      val wLoc = Window.partitionBy(col("shard"), col("src"))
        .orderBy(col("sim").desc, col("dst").asc)
      val local = a.join(b, Seq("shard"))
        .filter(col("src") =!= col("dst"))
        .withColumn("sim",
          round(GraftFunctions.cosineSim(col("ea"), col("eb")), 6))
        .select(col("shard"), col("src"), col("dst"), col("sim"))
        .repartition(col("shard"))
        .withColumn("__rn", row_number().over(wLoc))
        .filter(col("__rn") <= M)
        .select(col("src"), col("dst"), col("sim"))
      val out = local
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= M).select(col("src"), col("dst"), col("sim"))
      out.union(out.select(col("dst").as("src"), col("src").as("dst"), col("sim")))
        .groupBy(col("src"), col("dst")).agg(max(col("sim")).as("sim"))
        .withColumn("__rn", row_number().over(wSrc))
        .filter(col("__rn") <= MaxDegree)
        .select(lit(0).as("layer"), col("src"), col("dst"))
    }
    timeIt("cap-localtop")(capEdgesLocalTop(staged))
    // sanity: identical result sets
    val cur = capEdgesCur(blockedPairs(staged))
    Seq("repart" -> capEdgesRepart(blockedPairs(staged)),
        "localtop" -> capEdgesLocalTop(staged)).foreach { case (n, v) =>
      val d1 = cur.exceptAll(v).count()
      val d2 = v.exceptAll(cur).count()
      println(s"diff cur vs $n: $d1 / $d2")
    }
    spark.stop()
  }
}
