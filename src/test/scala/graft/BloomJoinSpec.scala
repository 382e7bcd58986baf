package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the shuffle-join complement to the
  * two pruning faces already in evidence (static partition pruning in the
  * IVF layouts, DSv2 runtime filtering in SourcesSpec): when a join's
  * small side carries a selective predicate, Catalyst's
  * InjectRuntimeFilter builds a bloom filter from the small side's join
  * keys and applies `might_contain` on the FACT side BEFORE its shuffle —
  * at 100 TB this is what keeps a fact⋈filtered-dim shuffle-merge join
  * from shuffling fact rows that can never match. (Broadcast joins don't
  * need it — the probe side filters during the join itself — so the spec
  * disables broadcast to force the shuffle-join shape the filter exists
  * for.)
  */
class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("a selective dim filter injects a bloom might_contain on the fact side of a shuffle join") {
    val confs = Seq(
      // force the SMJ/SHJ shape (broadcast joins filter inherently)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // prod default is 10 GB — the filter only pays for itself on a BIG
      // application side; at fixture scale we lower the floor to observe
      // the mechanism itself
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT") // selective dim side
        .select(col("o_orderkey"), col("o_totalprice"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected on the fact side:\n$optimized")
      // and the filtered plan returns exactly what the unfiltered one does
      val n = joined.head()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(n === plain.head(), "bloom pruning changed the result")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
