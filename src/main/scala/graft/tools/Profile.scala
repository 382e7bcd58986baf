package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for optimization round 14: times each named query's
  * noop materialization and counts jobs, stages and exchanges, so the
  * optimization work targets exchange-heavy plans (guide §1/§2).
  */
object Profile {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
      }
    })
    def drain(): Unit =
      org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // stage prebuilds so queries measure their own plans (not timed here)
    if (sys.env.get("SPARK_GRAFT_PROFILE_NOSTAGES").isEmpty)
      graft.Stages.all.foreach { case (_, b) => b(spark, sfDir) }
    println("== profile begins ==")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warm pass (JIT) then measured pass
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        drain()
        val (j0, s0, t0) = (jobs.get(), stages.get(), tasks.get())
        val w0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val planned = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val w1 = System.nanoTime()
        drain()
        val nEx = df.queryExecution.executedPlan.toString
          .linesIterator.count(l => l.contains("Exchange"))
        println(f"PROF ${(w1 - w0) / 1e9}%7.3f plan=${(planned - w0) / 1e9}%6.3f " +
          f"jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d " +
          f"tasks=${tasks.get() - t0}%5d exch=$nEx%2d $n")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"PROF ERR $n: ${e.getClass.getSimpleName}: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
