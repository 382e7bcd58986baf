package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch micro-probe for setsim_join (round-15): times the prefix
  * build, candidate join and verification separately, plus variants.
  */
object SetsimProbe {
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
    val t = 0.5
    val base = graft.queries.PipelineQueries.stagedLshShingles(spark, sfDir)
      .select(col("doc_id"), col("shs"),
        size(col("shs")).cast("long").as("n"))
    println("base rows=" + base.count())
    def timeIt(label: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val e = base.select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
    println("exploded rows=" + e.count())
    val freq = e.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    println("distinct shingles=" + freq.count())
    def prefDf = e.join(freq, Seq("sh"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .filter(col("rk") <= col("n") - ceil(col("n") * lit(t)) + 1)
      .select(col("doc_id"), col("sh"), col("n"), col("rk"))
    timeIt("pref-build")(prefDf)
    println("pref rows=" + prefDf.count())
    def candsOf(pref: DataFrame) = pref
      .select(col("doc_id").as("id_a"), col("sh"), col("n").as("na"),
        col("rk").as("rk_a"))
      .join(pref.select(col("doc_id").as("id_b"), col("sh"),
        col("n").as("nb"), col("rk").as("rk_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        col("na") >= lit(t) * col("nb") && col("nb") >= lit(t) * col("na") &&
        lit(1) + least(col("na") - col("rk_a"), col("nb") - col("rk_b")) >=
          ceil((col("na") + col("nb")) * lit(t / (1 + t))))
      .select(col("id_a"), col("id_b")).distinct()
    def verify(cands: DataFrame) = cands
      .join(base.select(col("doc_id").as("id_a"), col("shs").as("sa"),
        col("n").as("na")), Seq("id_a"))
      .join(base.select(col("doc_id").as("id_b"), col("shs").as("sb"),
        col("n").as("nb")), Seq("id_b"))
      .withColumn("ix", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac",
        round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
      .filter(col("jac") >= t)
      .select(col("id_a"), col("id_b"), col("jac"))
      .orderBy(col("id_a"), col("id_b"))
    val prefCk = prefDf.localCheckpoint()
    println("cands rows=" + candsOf(prefCk).count())
    val cCk = candsOf(prefCk).localCheckpoint()
    println("cands parts=" + cCk.rdd.getNumPartitions)
    timeIt("verify-full")(verify(cCk))
    timeIt("verify-noorder") {
      cCk
        .join(base.select(col("doc_id").as("id_a"), col("shs").as("sa"),
          col("n").as("na")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"), col("shs").as("sb"),
          col("n").as("nb")), Seq("id_b"))
        .withColumn("ix", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jac",
          round(col("ix") / (col("na") + col("nb") - col("ix")), 6))
        .filter(col("jac") >= t)
        .select(col("id_a"), col("id_b"), col("jac"))
    }
    timeIt("verify-nointersect") {
      cCk
        .join(base.select(col("doc_id").as("id_a"), col("shs").as("sa"),
          col("n").as("na")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"), col("shs").as("sb"),
          col("n").as("nb")), Seq("id_b"))
        .withColumn("ix", size(col("sa")) + size(col("sb")))
        .select(col("id_a"), col("id_b"), col("ix"))
    }
    timeIt("verify-joinsonly") {
      cCk
        .join(base.select(col("doc_id").as("id_a"), col("shs").as("sa"),
          col("n").as("na")), Seq("id_a"))
        .join(base.select(col("doc_id").as("id_b"), col("shs").as("sb"),
          col("n").as("nb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    timeIt("verify-repart32") {
      verify(cCk.repartition(32, col("id_a"), col("id_b")))
    }
    spark.stop()
  }
}
