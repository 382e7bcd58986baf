package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.TextOps
import graft.operators.Dedup

/** Ad-hoc perf exploration main (not part of the driver contract). */
object Explore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[explore] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = documents(spark, sfDir)
    println(s"[explore] docs partitions = ${docs.rdd.getNumPartitions}")

    time("tokenHashes only") {
      docs.withColumn("hs", TextOps.tokenHashes(col("text")))
        .select(sum(size(col("hs")))).head(); docs.count()
    }
    time("tokenHashes repart32") {
      docs.repartition(32).withColumn("hs", TextOps.tokenHashes(col("text")))
        .select(sum(size(col("hs")))).head(); docs.count()
    }
    time("+shingles") {
      docs.repartition(32)
        .withColumn("hs", TextOps.tokenHashes(col("text")))
        .withColumn("shs", Dedup.shingleHashes(col("hs")))
        .select(sum(size(col("shs")))).head(); docs.count()
    }
    time("+minhash") {
      docs.repartition(32)
        .withColumn("hs", TextOps.tokenHashes(col("text")))
        .withColumn("shs", Dedup.shingleHashes(col("hs")))
        .withColumn("mh", Dedup.minhashes(col("shs")))
        .select(sum(size(col("mh")))).head(); docs.count()
    }
    time("hashEmbed") {
      docs.repartition(32)
        .withColumn("e", TextOps.hashEmbed(col("text")))
        .select(sum(size(col("e")))).head(); docs.count()
    }
    time("hashEmbedRaw (no normalize)") {
      docs.repartition(32)
        .withColumn("e", TextOps.hashEmbedRaw(col("text")))
        .select(sum(size(col("e")))).head(); docs.count()
    }
    time("registered minhash_signature query") {
      graft.SparkEntry.queries("minhash_signature")(spark, sfDir).count()
    }
    time("minhash chain + posexplode, no orderBy") {
      docs
        .withColumn("hs", TextOps.tokenHashes(col("text")))
        .withColumn("shs", Dedup.shingleHashes(col("hs")))
        .withColumn("mh", Dedup.minhashes(col("shs")))
        .select(col("doc_id"), posexplode(col("mh"))).count()
    }
    time("chain + posexplode + orderBy") {
      docs
        .withColumn("hs", TextOps.tokenHashes(col("text")))
        .withColumn("shs", Dedup.shingleHashes(col("hs")))
        .withColumn("mh", Dedup.minhashes(col("shs")))
        .select(col("doc_id"), posexplode(col("mh")))
        .orderBy(col("doc_id"), col("pos")).count()
    }
    // optimized plan of the registered query
    val q = graft.SparkEntry.queries("minhash_signature")(spark, sfDir)
    println(q.queryExecution.optimizedPlan.treeString.take(6000))
    spark.stop()
  }
}
