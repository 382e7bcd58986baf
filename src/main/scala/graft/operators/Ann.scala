package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Approximate nearest-neighbor search via IVF-style partition pruning.
  *
  * The exact brute-force scan (Knn.topK) is O(N·d) per query — the right
  * correctness oracle, impossible at 100 TB. The scale path: assign every
  * vector to a coarse cell; at query time probe only the nearest cell(s).
  * With the cell id as a Parquet partition column, Catalyst partition
  * pruning turns a corpus-wide scan into a single-cell scan — 1/cells of
  * the I/O; nprobe > 1 trades recall for I/O linearly.
  *
  * Cells here are the fixture's `label` column with a deterministic medoid
  * (min-vec_id member) as the cell representative — deterministic (no
  * trained kmeans state), so the whole path is DuckDB-oracle-checkable.
  * Swapping in trained centroids (MLlib KMeans fit offline, broadcast) does
  * not change the query plan shape.
  */
object Ann {

  private val layouts = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize the sf dir's embeddings as a cell-partitioned parquet
    * table (the IVF physical layout), once per JVM per sf dir. At real
    * scale this is the one-time index build; queries then partition-prune.
    */
  def ivfLayout(spark: SparkSession, sfDir: String, cellCol: String = "label"): String =
    layouts.computeIfAbsent(sfDir, { _ =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft-ivf-" +
        Integer.toHexString(sfDir.hashCode)
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .write.mode("overwrite").partitionBy(cellCol).parquet(dir)
      dir
    })

  /** One representative (medoid = min-id member) per cell. Tiny result —
    * always broadcastable.
    */
  def cellMedoids(vecs: DataFrame, cellCol: String, idCol: String,
                  embCol: String): DataFrame = {
    val w = Window.partitionBy(col(cellCol)).orderBy(col(idCol))
    vecs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(cellCol).as("cell"), col(embCol).as("centroid"))
  }

  /** IVF search: probe the `nprobe` nearest cells (by cosine to their
    * medoids), then exact top-k within the probed cells only. `query` is a
    * 1-row DataFrame with column `q_emb`. nprobe is the recall↔I/O knob:
    * scanned fraction ≈ nprobe/cells, recall grows monotonically (at
    * nprobe = cells this IS the exact scan).
    */
  def ivfSearch(vecs: DataFrame, query: DataFrame, cellCol: String,
                idCol: String, embCol: String, k: Int,
                excludeId: Option[Long] = None, nprobe: Int = 1): DataFrame = {
    GraftFunctions.register(vecs.sparkSession)
    val medoids = cellMedoids(vecs, cellCol, idCol, embCol)
    val probe = medoids.crossJoin(broadcast(query))
      .withColumn("csim", round(GraftFunctions.cosineSim(col("centroid"), col("q_emb")), 6))
      .orderBy(col("csim").desc, col("cell").asc)
      .limit(nprobe)
      .select(col("cell"))
    val pruned = vecs.join(broadcast(probe), col(cellCol) === col("cell"), "left_semi")
    val base = excludeId.map(id => pruned.filter(col(idCol) =!= id)).getOrElse(pruned)
    Knn.topK(base, query, idCol, embCol, k, Seq(idCol, cellCol))
  }
}
