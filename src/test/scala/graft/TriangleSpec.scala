package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

class TriangleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic dense pseudo-random multigraph: 600 hashed draws over
    * 40 nodes (murmur mixing; the multiplicative-hash constants degenerate
    * mod 40).
    */
  private def randomGraph: DataFrame =
    spark.range(600).selectExpr(
      "pmod(hash(id), 40L) AS u", "pmod(hash(id + 1000), 40L) AS v")

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("u", "v")
  }

  test("K4 plus a pendant edge has exactly 4 triangles") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 9L), // pendant: in no triangle
      (2L, 1L), (3L, 3L)) // reverse duplicate + self-loop: canonicalized away
    val n = Triangles.count(k4, col("u"), col("v")).collect()(0).getLong(0)
    assert(n === 4L)
  }

  test("degree-oriented count equals id-oriented brute force on a hashed random graph") {
    // deterministic pseudo-random multigraph: 600 draws over 40 nodes
    val g = randomGraph
    val n = Triangles.count(g, col("u"), col("v")).collect()(0).getLong(0)
    // independent check: orient by ID instead of degree (canonEdges already
    // has a < b) and run the same wedge + closing joins
    val o = Triangles.canonEdges(g, col("u"), col("v"))
    val brute = o.select(col("a").as("x"), col("b").as("y"))
      .join(o.select(col("a").as("y"), col("b").as("z")), "y")
      .join(o.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      .count()
    assert(n > 0, "fixture graph must contain triangles")
    assert(n === brute, s"degree-oriented $n vs id-oriented $brute")
  }

  test("per-node participation sums to 3x the global count") {
    val g = randomGraph
    val n = Triangles.count(g, col("u"), col("v")).collect()(0).getLong(0)
    val perNode = Triangles.perNode(g, col("u"), col("v"))
      .agg(sum(col("n_tri"))).collect()(0).getLong(0)
    assert(perNode === 3 * n)
  }

  test("orientation is a bijection on canonical edges (no edge lost or doubled)") {
    val g = randomGraph
    val canon = Triangles.canonEdges(g, col("u"), col("v"))
    val oriented = Triangles.orient(canon)
    assert(oriented.count() === canon.count())
    assert(oriented.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct().count()
      === canon.count())
  }

  test("orientation caps out-degree near sqrt(2m) — the arboricity bound, on the real graph") {
    val dir = "/root/testdata/sf0.01"
    val edges = graft.queries.PipelineQueries.stagedCoocEdges(spark, dir)
    val m = edges.count()
    val maxOut = Triangles.orient(edges.select(col("a"), col("b")))
      .groupBy(col("src")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    // degree orientation guarantees out-degree < sqrt(2m) + 1: an edge
    // leaves a node only toward HIGHER-degree neighbors, so a node with
    // out-degree d has degree ≥ d and so do d of its neighbors → the
    // graph carries ≥ d·(d+1)/2 edge-endpoints among them → d ≲ sqrt(2m).
    val bound = math.sqrt(2.0 * m) + 1
    assert(maxOut <= bound,
      s"max out-degree $maxOut exceeds the sqrt(2m)=$bound arboricity bound (m=$m)")
    // and the un-oriented wedge count would have been far larger: the
    // oriented wedge work (sum of out-deg²) must undercut sum(deg²)
    val deg2 = edges.select(col("a").as("n")).unionAll(edges.select(col("b").as("n")))
      .groupBy(col("n")).count().agg(sum(col("count") * col("count")))
      .collect()(0).getLong(0)
    val out2 = Triangles.orient(edges.select(col("a"), col("b")))
      .groupBy(col("src")).count().agg(sum(col("count") * col("count")))
      .collect()(0).getLong(0)
    assert(out2 < deg2, s"orientation must shrink wedge work: $out2 vs $deg2")
  }

  test("registered co-occurrence triangle queries are consistent with each other") {
    val dir = "/root/testdata/sf0.01"
    val n = SparkEntry.queries("triangle_count")(spark, dir)
      .collect()(0).getLong(0)
    val per = SparkEntry.queries("triangle_per_node")(spark, dir)
      .agg(sum(col("n_tri"))).collect()(0).getLong(0)
    assert(n > 0, "sf0.01 co-occurrence graph must contain triangles")
    assert(per === 3 * n)
  }
}
