package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextOps
import graft.operators.Dedup

object Explore2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = documents(spark, sfDir)
    val chain = docs
      .withColumn("hs", TextOps.tokenHashes(col("text")))
      .withColumn("shs", Dedup.shingleHashes(col("hs")))
      .withColumn("mh", Dedup.minhashes(col("shs")))
      .select(col("doc_id"), posexplode(col("mh")))
    val plan = chain.queryExecution.optimizedPlan.treeString
    // print a compressed view: node names + output/generator summary
    plan.split("\n").foreach { l =>
      val t = if (l.length > 300) l.take(300) + s"...(len ${l.length})" else l
      println("PLAN| " + t)
    }
    spark.stop()
  }
}
