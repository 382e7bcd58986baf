package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch job-level profiler for stage builders (round-15 optimization,
  * not part of the bench contract): cold-builds the named stages and
  * prints every Spark job the build ran — duration, task count, and the
  * job's call site — so per-stage time decomposes into its actual jobs
  * (guide §1.1 empirical loop; the stage builds are opaque to the SQL
  * tab because most of their time is many small jobs).
  */
object StageJobs {
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val sites = j.stageInfos.map(s => s"${s.name.takeWhile(_ != '+').trim}[${s.numTasks}]")
          .distinct.mkString(" | ")
        val site = desc.map(d => s"$d :: $sites").getOrElse(sites)
        starts.put(j.jobId, (System.nanoTime(), site, j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site, tasks) =>
          lines.add((j.jobId,
            f"JOB ${(System.nanoTime() - t0) / 1e9}%7.3f tasks=$tasks%4d $site"))
        }
      }
    })
    def drain(): Unit =
      org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    val reps = sys.env.getOrElse("STAGEJOBS_REPS", "1").toInt
    val want = args.toSet
    val picked = graft.Stages.all.filter { case (n, _) => want.isEmpty || want(n) }
    // warm pass (JIT + parquet footers), then the measured cold passes
    // (min-of-N against host noise — the bench's own methodology)
    picked.foreach { case (_, b) => b(spark, sfDir) }
    (1 to reps).foreach { rep =>
      graft.Stages.resetAll(spark)
      picked.foreach { case (n, b) =>
        drain(); lines.clear()
        val t0 = System.nanoTime()
        b(spark, sfDir)
        val secs = (System.nanoTime() - t0) / 1e9
        drain()
        println(f"\n===== STAGE $n: $secs%7.3f s, ${lines.size} jobs (rep $rep) =====")
        if (rep == 1) {
          import scala.jdk.CollectionConverters._
          lines.asScala.toSeq.sortBy(_._1).foreach(l => println(l._2))
        }
      }
    }
    spark.stop()
  }
}
