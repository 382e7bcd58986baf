package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Degree-oriented triangle counting (Latapy 2008; the classic
  * MapReduce/Spark formulation of Cohen 2009, "Graph Twiddling in a
  * MapReduce World").
  *
  * The naive plan — join the undirected edge list with itself twice —
  * enumerates every WEDGE (path of length 2), and wedge count is
  * sum(deg²): a single celebrity node with 10M neighbours yields 10¹⁴
  * wedges before the closing-edge check prunes anything. The standard
  * fix is to ORIENT each edge from its lower-(degree, id) endpoint to the
  * higher one. Orientation by any total order makes the edge DAG acyclic
  * and counts each triangle exactly once (its three edges orient
  * x→y, x→z, y→z for the unique ordered corner x<y<z); ordering by DEGREE
  * specifically bounds every out-degree by O(√m) (arboricity), so wedge
  * work collapses from sum(deg²) to O(m^1.5) — the celebrity node emits
  * almost nothing because nearly all its edges point INTO it.
  *
  * Spark shape: three equi-joins (degree attach ×2, wedge, closing),
  * all shuffle-partitioned on node keys; nothing is ever broadcast-sized
  * except by AQE's own choice, and no step holds more than an adjacency
  * digest — the 100 TB posture is the orientation bound, not a cap.
  */
object Triangles {

  /** Canonicalize an undirected edge list: self-loops dropped, both
    * orientations + duplicates collapsed to one (a < b) row per edge.
    */
  def canonEdges(edges: DataFrame, u: Column, v: Column): DataFrame =
    edges.select(least(u, v).as("a"), greatest(u, v).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Degree-oriented edges (src → dst by ascending (degree, id)) of the
    * canonical edge list. Max out-degree is O(√m) regardless of skew.
    */
  def orient(e0: DataFrame): DataFrame = {
    val deg = e0.select(col("a").as("n")).unionAll(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(F.count(lit(1)).as("d"))
    val da = deg.select(col("n").as("a"), col("d").as("da"))
    val db = deg.select(col("n").as("b"), col("d").as("db"))
    // e0 already has a < b, so the equal-degree tie keeps a → b
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    e0.join(da, "a").join(db, "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("src"),
        when(fwd, col("b")).otherwise(col("a")).as("dst"))
  }

  /** All triangles of the undirected graph, one row per triangle, as the
    * oriented corners (x, y, z) with x→y, x→z, y→z.
    */
  def triangles(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val o = orient(canonEdges(edges, u, v))
    val wedges = o.select(col("src").as("x"), col("dst").as("y"))
      .join(o.select(col("src").as("y"), col("dst").as("z")), "y")
    wedges.join(o.select(col("src").as("x"), col("dst").as("z")), Seq("x", "z"))
      .select(col("x"), col("y"), col("z"))
  }

  /** Global triangle count (1 row: n_triangles). */
  def count(edges: DataFrame, u: Column, v: Column): DataFrame =
    triangles(edges, u, v).agg(F.count(lit(1)).as("n_triangles"))

  /** Per-node triangle participation: (n, n_tri) for every node in at
    * least one triangle — each triangle credits all three corners.
    */
  def perNode(edges: DataFrame, u: Column, v: Column): DataFrame = {
    val t = triangles(edges, u, v)
    t.select(col("x").as("n"))
      .unionAll(t.select(col("y").as("n")))
      .unionAll(t.select(col("z").as("n")))
      .groupBy(col("n")).agg(F.count(lit(1)).as("n_tri"))
  }
}
