package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("connected components: chains, cliques, singletons") {
    // components: {1,2,3,4} (chain), {10,11} (edge), {20} (singleton)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val reps = Components.connectedComponents(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(reps(_) === 1L))
    assert(reps(10L) === 10L && reps(11L) === 10L)
    assert(reps(20L) === 20L)
  }

  test("dedup_components: every exact duplicate lands in its copy's cluster") {
    val out = SparkEntry.queries("dedup_components")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 1000)
    val reps = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each doc and its id+10000 copy are exact dups → same cluster
    (0L until 500L).foreach { id =>
      assert(reps(id) === reps(id + 10000L), s"copy of $id split from it")
    }
    // rep is the min member id of its cluster
    out.groupBy(_.getLong(1)).foreach { case (rep, members) =>
      assert(members.map(_.getLong(0)).min === rep)
      assert(members.length >= 2) // at least the doubled pair
    }
    // some distinct docs of this synthetic corpus are genuine near-dups,
    // so clusters can merge — but never exceed one per original doc
    assert(out.map(_.getLong(1)).distinct.length <= 500)
  }
}
