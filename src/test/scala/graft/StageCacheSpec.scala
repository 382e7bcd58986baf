package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The staged-table memo contract: one build per (session, key), identity
  * reuse across consumers, eviction unpersists and forces a rebuild.
  */
class StageCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("getOrStage builds once per key and returns the staged frame to every consumer") {
    val builds = new AtomicInteger(0)
    def build = {
      builds.incrementAndGet()
      spark.range(100).toDF("id")
    }
    val a = StageCache.getOrStage(spark, "spec-key-1")(build)
    val b = StageCache.getOrStage(spark, "spec-key-1")(build)
    val other = StageCache.getOrStage(spark, "spec-key-2")(build)
    assert(builds.get() === 2, "expected one build per distinct key")
    assert(a eq b, "second consumer must get the SAME staged frame")
    assert(a.count() === 100 && other.count() === 100)
    // staged = materialized: the plan is a checkpointed scan, not the
    // original range (re-running the lineage would defeat the stage)
    assert(a.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      s"staged frame not checkpointed:\n${a.queryExecution.optimizedPlan}")
  }

  test("evict drops the session's staged frames and the next get rebuilds") {
    val builds = new AtomicInteger(0)
    def build = { builds.incrementAndGet(); spark.range(10).toDF("id") }
    StageCache.getOrStage(spark, "spec-evict")(build)
    StageCache.evict(spark)
    StageCache.getOrStage(spark, "spec-evict")(build)
    assert(builds.get() === 2, "eviction must force a rebuild")
    StageCache.evict(spark) // leave no state for other suites
  }
}
