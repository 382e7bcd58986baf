package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier): the rows no other row beats
  * on BOTH axes — minimize `xCol`, maximize `yCol` (flip a sign to change
  * direction). "Cheapest part at every size point", "shortest doc at every
  * quality level", etc.
  *
  * The naive spelling is a quadratic NOT EXISTS self-join (the oracle — fine
  * at sf, impossible at 100 TB); the obvious streaming spelling is a running
  * max over a GLOBAL x-ordered window — `Exchange SinglePartition`, the same
  * plan GlobalRowNum refuses. The scalable scheme (Börzsönyi 2001's
  * sort-based skyline, distributed the GlobalRowNum way):
  *
  *   1. per-x champion: `groupBy(x).max(y)` — dominated same-x rows die in a
  *      map-side-combinable aggregate, the frontier candidate set shrinks to
  *      the distinct-x digest;
  *   2. range-partition the digest on x: partition i holds a contiguous x
  *      range, every partition scans its own running max in parallel (a
  *      window PARTITIONED by the range id — never global);
  *   3. cross-partition fix-up: each partition's y-max is #partitions doubles
  *      of metadata; the exclusive prefix max over them broadcasts back, and
  *      a candidate survives iff it beats both its local running max and
  *      every earlier partition's best.
  *
  * A surviving (x, y) pair readmits ALL its duplicate rows (ties on both
  * axes dominate nobody strictly) via the final semi-join.
  */
object Skyline {

  def skyline(df: DataFrame, xCol: String, yCol: String,
              numPartitions: Int = 8): DataFrame = {
    val champions = df.groupBy(col(xCol)).agg(max(col(yCol)).as(yCol))
    // the range partitioning SAMPLES to pick boundaries — pin it (same
    // discipline as GlobalRowNum) so the metadata pass and the filter pass
    // observe identical placement
    val ranged = champions
      .repartitionByRange(numPartitions, col(xCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // per-partition exclusive running max: window keyed by the partition id
    // — partition-bounded, never a single global sort
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = ranged
      .withColumn("__localPrev", max(col(yCol)).over(wLocal))
    // #partitions rows of metadata → exclusive prefix max per partition.
    // All maxima stay in yCol's NATIVE type end to end — a double detour
    // here loses precision past 2^53 for BIGINT axes, making distinct y
    // values compare equal and corrupting the frontier. The prefix max is
    // a global window over ≤ numPartitions AGGREGATED rows (bytes of
    // metadata, never corpus) so the SinglePartition exchange is free;
    // the null sentinel replaces -Inf ("no earlier partition"), and
    // greatest() skips nulls by definition.
    val partMax = ranged.groupBy(col("__pid")).agg(max(col(yCol)).as("__pm"))
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixDf = partMax
      .withColumn("__prevBest", max(col("__pm")).over(wPrefix))
      .select(col("__pid"), col("__prevBest"))
    val frontier = withLocal
      .join(broadcast(prefixDf), Seq("__pid"), "left")
      .withColumn("__best", greatest(col("__localPrev"), col("__prevBest")))
      .filter(col("__best").isNull || col(yCol) > col("__best"))
      .select(col(xCol), col(yCol))
    df.join(frontier, Seq(xCol, yCol), "left_semi")
  }
}
