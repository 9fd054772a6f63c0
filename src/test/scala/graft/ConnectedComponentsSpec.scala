package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chain graph collapses to one component (multi-hop propagation)") {
    // path 1-2-3-4-5: diameter 4 forces several propagation rounds
    val nodes = (1L to 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = ConnectedComponents.run(nodes, edges).orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L, 1L, 1L))
  }

  test("disjoint components keep distinct min labels; singletons label themselves") {
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((2L, 1L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val out = ConnectedComponents.run(nodes, edges).orderBy("id").collect()
    val comp = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("distributed contraction rounds (guard=0) agree with the driver finish") {
    // same graphs as above, but force the star-contraction loop to do all
    // the work (driverFinishEdges = 0 disables the in-memory remainder) —
    // a differential between the two execution paths
    val nodes = (1L to 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L), (8L, 9L))
      .toDF("src", "dst")
    val dist = ConnectedComponents.run(nodes, edges, driverFinishEdges = 0)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val drv = ConnectedComponents.run(nodes, edges)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(dist == drv)
    assert(dist.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("direction of the input edge does not matter") {
    val nodes = (1L to 3L).toDF("id")
    val fwd = Seq((1L, 3L), (3L, 2L)).toDF("src", "dst")
    val rev = Seq((3L, 1L), (2L, 3L)).toDF("src", "dst")
    val a = ConnectedComponents.run(nodes, fwd).orderBy("id").collect().map(_.getLong(1)).toSeq
    val b = ConnectedComponents.run(nodes, rev).orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(a == b && a == Seq(1L, 1L, 1L))
  }
}
