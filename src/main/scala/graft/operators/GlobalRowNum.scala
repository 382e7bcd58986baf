package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous global row numbering that scales.
  *
  * `row_number() OVER (ORDER BY …)` — the obvious spelling — plans a
  * SINGLE-partition window (`Exchange SinglePartition`): every row of the
  * table funnels through one task. Works at sf0.01, dies at 100 TB. The
  * scalable equivalent is the classic two-pass offset scheme (what
  * `RDD.zipWithIndex` does under the hood, kept here in the Dataset world):
  *
  *   1. range-repartition on the sort key and sort within partitions —
  *      partition i now holds a contiguous key range, all of partition i
  *      sorts before all of partition i+1;
  *   2. count rows per partition — #partitions values, pure metadata;
  *   3. per-partition prefix sums give each partition its starting offset;
  *      a `mapPartitions` pass assigns `offset + local position`.
  *
  * The sorted frame is `localCheckpoint`ed between pass 1 and the two reads
  * because range partitioning SAMPLES the input to pick boundaries: the
  * count pass and the numbering pass must observe the IDENTICAL partitioning
  * or offsets would disagree with placement. On a cluster this staging is a
  * `persist(DISK_ONLY)` or a sorted table write — one materialization, which
  * a global ordering fundamentally requires anyway.
  *
  * Numbering is only deterministic when the sort key is total; callers pass
  * a tie-broken key (the registry query orders by (n_chars, doc_id)).
  */
object GlobalRowNum {

  def withRowNumber(df: DataFrame, order: Seq[Column], numPartitions: Int,
                    outCol: String = "rn"): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint()
    // #partitions rows — index metadata, same class of collect as
    // IvfRewrite's cell count (never data-sized)
    val counts = sorted
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      val n = if (counts.isEmpty) 0 else counts.keys.max + 1
      val arr = (0 until n).scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
      (0 until n).map(pid => pid -> arr(pid)).toMap
    }
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    // offsets rides the task closure: Map[Int, Long] of #partitions entries
    sorted.mapPartitions { it =>
      var i = offsets.getOrElse(TaskContext.getPartitionId(), 0L)
      it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
    }(Encoders.row(schema))
  }
}
