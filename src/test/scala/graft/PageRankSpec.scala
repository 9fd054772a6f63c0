package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

/** Fixpoint-vs-fixed-round contract for [[graft.ops.PageRank]] — the same
  * pattern KCoreSpec pins for the peeling fixpoint: the oracle-checked
  * query (g4) stays the unrolled fixed-round form; the production twin
  * iterates to an L1 tolerance with checkpoint cadence.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Directed 4-cycle, unit weights: regular, so the uniform vector is the
    * EXACT integer fixpoint (tele + pr*85 div 100 = 250M for n=4) and the
    * very first round reports delta 0.
    */
  private def cycle4 = {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
      .withColumn("w", lit(1L))
      .withColumn("outw", lit(1L))
    (nodes, edges)
  }

  test("fixed-round equals fixpoint on a graph that converges in one round") {
    val (nodes, edges) = cycle4
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fixed = rows(PageRank.iterate(nodes, edges, 4L, 3))
    val fix = rows(PageRank.converged(nodes, edges, 4L, tolPpb = 0L))
    assert(fixed === fix)
    // and the fixpoint is the exact uniform vector
    assert(fix === Seq(0L, 1L, 2L, 3L).map(_ -> 250000000L))
  }

  test("converged plan stays constant-size: no lineage blowup across rounds") {
    // an asymmetric graph under a 0 tolerance runs to maxRounds; the final
    // frame must still be a flat scan of checkpointed partitions, not a
    // 20-round-deep join tree
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    val edges = Seq((0L, 1L, 1L, 3L), (0L, 2L, 2L, 3L), (1L, 0L, 1L, 1L), (2L, 0L, 1L, 1L))
      .toDF("src", "dst", "w", "outw")
    val pr = PageRank.converged(nodes, edges, 3L, tolPpb = 0L, maxRounds = 20)
    val planLines = pr.queryExecution.optimizedPlan.numberedTreeString.linesIterator.size
    assert(planLines <= 5, s"expected a flat checkpoint scan, got $planLines plan lines")
    // ranks are a proper probability vector up to integer floor: sum <= 1e9,
    // within n floors of it
    val total = pr.agg(sum(col("pr"))).head().getLong(0)
    assert(total <= 1000000000L && total > 1000000000L - 100L)
  }

  test("PageRank.iterate(25, 3) reproduces the oracle-pinned g4 ranks") {
    val sf = "/root/testdata/sf0.01"
    // g4's edge build: supplier nation -> customer nation, weight = lineitems
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .select(col("s_nationkey").cast("long").as("src"), col("c_nationkey").cast("long").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val e = edges.join(edges.groupBy(col("src")).agg(sum(col("w")).as("outw")), Seq("src"))
    val nodes = Tables.nation(spark, sf).select(col("n_nationkey").cast("long").as("node"))
    val mine = PageRank.iterate(nodes, e, 25L, 3)
      .select(col("node").as("nation_key"), (col("pr").cast("double") / 1e9).as("pagerank"))
      .orderBy("nation_key").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val g4 = SparkEntry.queries("g4_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mine === g4)
  }
}
