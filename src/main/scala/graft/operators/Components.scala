package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative smallest-representative
  * propagation — the clustering step of near-duplicate removal: LSH/band
  * candidate PAIRS become duplicate CLUSTERS, and one representative per
  * cluster survives.
  *
  * Each iteration: every node adopts the minimum representative among
  * itself and its neighbors; converges in O(component diameter) rounds —
  * near-dup clusters are almost-cliques, so 2–3 rounds in practice. All
  * data movement is (node, rep) pairs shuffled by node id; text never
  * moves. The driver-side loop only compares a per-round checksum
  * (aggregate fixpoint detection), it never collects the data.
  */
object Components {

  /** @param edges two-column DataFrame (id_a, id_b), undirected
    * @param nodes one-column DataFrame (id) — nodes with no edges form
    *              singleton components
    * @return (id, rep) with rep = min node id of the component
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIterations: Int = 20): DataFrame = {
    // materialize the edge list ONCE — it may be the output of a whole
    // LSH pipeline, and the loop below would otherwise recompute it every
    // iteration (measured 38s -> ~5s at sf0.1)
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var rep = nodes.select(col("id"), col("id").as("rep"))
    var lastSum = -1L
    var i = 0
    var converged = false
    while (i < maxIterations && !converged) {
      val neighborRep = sym.join(rep, sym("dst") === rep("id"))
        .select(sym("src").as("id"), col("rep"))
      val next = rep.select(col("id"), col("rep"))
        .union(neighborRep)
        .groupBy(col("id"))
        .agg(min(col("rep")).as("rep"))
        .localCheckpoint() // truncate the growing iterative lineage
      // sum(rep) is NULL on empty input — null-safe read so an empty nodes
      // frame converges to an empty result instead of throwing
      val s = Option(next.agg(sum(col("rep"))).head().getAs[java.lang.Long](0))
        .map(_.longValue).getOrElse(0L)
      converged = s == lastSum
      lastSum = s
      rep = next
      i += 1
    }
    rep
  }
}
