package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe for optimization round 14 (not part of the bench
  * contract): quantifies per-job overhead of repeated tiny digest
  * aggregations under AQE on/off and via RDD treeAggregate.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val xy = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").as("y"))
      .localCheckpoint()
    println("xy rows = " + xy.count() + " partitions = " + xy.rdd.getNumPartitions)

    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // 1. 40 digest aggregations, AQE on (current qreg shape)
    timeIt("40x agg AQE on") {
      var i = 0
      while (i < 40) {
        xy.agg(sum(col("x") * lit(i)).as("a"), sum(col("y")).as("b"),
          sum(col("x") * col("y")).as("c"), sum(col("x") * col("x")).as("d"),
          sum(col("y") * col("y")).as("e")).head()
        i += 1
      }
    }
    // 2. same with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timeIt("40x agg AQE off") {
      var i = 0
      while (i < 40) {
        xy.agg(sum(col("x") * lit(i)).as("a"), sum(col("y")).as("b"),
          sum(col("x") * col("y")).as("c"), sum(col("x") * col("x")).as("d"),
          sum(col("y") * col("y")).as("e")).head()
        i += 1
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // 3. RDD treeAggregate over a cached primitive RDD
    val rdd = xy.rdd.map(r => (r.getDouble(0), r.getDouble(1))).cache()
    rdd.count()
    timeIt("40x treeAggregate") {
      var i = 0
      while (i < 40) {
        rdd.treeAggregate(new Array[Double](5))(
          (acc, p) => { acc(0) += p._1 * i; acc(1) += p._2; acc(2) += p._1 * p._2
            acc(3) += p._1 * p._1; acc(4) += p._2 * p._2; acc },
          (a, b) => { var j = 0; while (j < 5) { a(j) += b(j); j += 1 }; a })
        i += 1
      }
    }
    // 4. plain rdd.aggregate (single stage, partials straight to driver)
    timeIt("40x rdd.aggregate") {
      var i = 0
      while (i < 40) {
        rdd.aggregate(new Array[Double](5))(
          (acc, p) => { acc(0) += p._1 * i; acc(1) += p._2; acc(2) += p._1 * p._2
            acc(3) += p._1 * p._1; acc(4) += p._2 * p._2; acc },
          (a, b) => { var j = 0; while (j < 5) { a(j) += b(j); j += 1 }; a })
        i += 1
      }
    }
    // 5. noop write overhead floor: trivial 1-row df, 40 times
    timeIt("40x 1-row noop write") {
      var i = 0
      while (i < 40) {
        spark.range(1).write.format("noop").mode("overwrite").save()
        i += 1
      }
    }
    spark.stop()
  }
}
