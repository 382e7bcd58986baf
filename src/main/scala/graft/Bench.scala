package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (scheduler, codegen, parquet reader) so the first
    // measured query doesn't absorb session startup.
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    Tables.region(spark, sfDir).count()
    // A failed query must not masquerade as a fast pass: record -1 for its
    // time and list it under "errors".
    // Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and reports
    // the MIN: round-over-round twins with identical plans were diverging
    // 3.5× on single-shot timings (JIT/GC/run-order noise on the driver
    // box); min-of-N measures the plan, not the first JIT pass. Shared
    // staged builds (StageCache, IVF layout, Derby store) are pre-built
    // below as their own stage:* line items, so every query — including a
    // single-run pass — measures against warm memos. See PERF.md.
    val runs = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(v => scala.util.Try(v.toInt).toOption
        .orElse { System.err.println(s"ignoring non-numeric SPARK_GRAFT_BENCH_RUNS='$v'"); None })
      .getOrElse(2))
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // One-time staged builds (StageCache memos, IVF/PQ index builds, Derby)
    // are pre-built here, each timed as its own "stage:<name>" line item, so
    // query timings measure their own plans against warm memos — not
    // whichever query happened to touch a cold memo first.
    val stageResults = Stages.all.map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok = try { build(spark, sfDir); true }
      catch { case scala.util.control.NonFatal(_) => errors += s"stage:$name"; false }
      s"stage:$name" -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Materialize with the noop DSv2 sink, NOT .count(): under a count
    // aggregate Catalyst prunes the output projection and eliminates the
    // result sort — for map-only queries the very work being benched is
    // deleted from the plan (round-4 verdict, verified empirically). The
    // noop sink consumes every row of the full plan and writes nothing.
    val results = SparkEntry.queries.map { case (name, fn) =>
      var best = Double.MaxValue
      var ok = true
      var r = 0
      while (ok && r < runs) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case scala.util.control.NonFatal(_) => errors += name; ok = false }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        r += 1
      }
      name -> (if (ok) best else -1.0)
    }
    val qs = (results ++ stageResults).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total counts the staged builds too — they are real work, just
    // attributed to their own line items instead of an arbitrary query
    val total = (results.values ++ stageResults.map(_._2)).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // stdout tails get truncated in driver captures; also persist the full
    // per-query JSON so every round's numbers are enumerable afterwards
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_DETAIL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      line.getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"could not write $out: $e") }
    spark.stop()
  }
}
