package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DigestPass

/** Pins the round-15 scale posture of the model-fit digest fold: above
  * [[DigestPass.TreePartitionThreshold]] partitions the merge runs
  * through one tree level (√P groups, √P digests to the driver) and the
  * cached primitives store serialized. The tree path must agree with the
  * flat path bit-for-bit on integer-valued digests (fp addition is
  * associative on exactly-representable sums) and be deterministic
  * run-over-run on fractional ones.
  */
class DigestPassSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withThreshold[T](t: Int)(body: => T): T = {
    val old = DigestPass.TreePartitionThreshold
    DigestPass.TreePartitionThreshold = t
    try body finally DigestPass.TreePartitionThreshold = old
  }

  test("tree merge ≡ flat merge on integer-valued digests, any threshold") {
    val rows = spark.sparkContext.parallelize(1L to 10000L, 64)
    def digest(): Array[Double] = DigestPass.fold(rows, 3) { (acc, v) =>
      acc(0) += 1.0; acc(1) += v.toDouble; acc(2) += (v % 7).toDouble
    }
    val flat = withThreshold(1 << 20)(digest())
    val tree = withThreshold(8)(digest())
    assert(flat.toSeq === tree.toSeq)
    assert(flat(0) === 10000.0 && flat(1) === 10000.0 * 10001.0 / 2)
  }

  test("tree merge is deterministic run-over-run on fractional digests") {
    val rows = spark.sparkContext.parallelize(1L to 5000L, 50)
    def digest(): Seq[Double] = withThreshold(4) {
      DigestPass.fold(rows, 2) { (acc, v) =>
        acc(0) += 1.0 / v; acc(1) += math.sqrt(v.toDouble)
      }.toSeq
    }
    assert(digest() === digest())
  }

  test("cachedDoubles stores serialized above the threshold, deserialized below") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 0.5)).toDF("a", "b")
      .repartition(10)
    val low = DigestPass.cachedDoubles(df)
    assert(low.getStorageLevel ===
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lowSum = DigestPass.fold(low, 2) { (acc, a) =>
      acc(0) += a(0); acc(1) += a(1) }
    low.unpersist()
    val high = withThreshold(4)(DigestPass.cachedDoubles(df))
    assert(high.getStorageLevel ===
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val highSum = withThreshold(4)(DigestPass.fold(high, 2) { (acc, a) =>
      acc(0) += a(0); acc(1) += a(1) })
    high.unpersist()
    assert(lowSum.toSeq === highSum.toSeq)
  }
}
