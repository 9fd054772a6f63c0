package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.AllPacks

/** Semantic property gates for the s15 MIPS reduction and the g10 BFS
  * traversal — both have DuckDB oracles (engine parity), but parity can't
  * prove the ALGORITHMIC claims: that the norm-augmented cosine ranks
  * exactly like the raw inner product, and that hop labels are a valid
  * breadth-first distance assignment. Those invariants get their own gate.
  */
class MipsBfsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s15: augmented-cosine ranking is exactly the inner-product ranking") {
    // the reduction claims aug_cos = dot/(M*||q||) is a monotone rescale of
    // dot — so sorting the output by dot_q must yield the same vec_id order
    // the query already emitted (it sorts by aug_cos)
    val out = AllPacks.queries("s15_mips_topk")(spark, sf)
      .collect().toSeq
    val byAug = out.map(_.getLong(0))
    val byDot = out.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0))
    assert(byAug == byDot, "augmented-cosine order diverged from dot order")
    // and the top-1 really is the corpus argmax of the raw inner product
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val top = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        graft.functions.VectorOps.dot(col("embedding"), col("q_emb")).as("dp"))
      .orderBy(col("dp").desc, col("vec_id"))
      .limit(1).collect()(0).getLong(0)
    assert(byAug.head == top, s"top-1 ${byAug.head} is not the MIPS argmax $top")
  }

  test("g10: hop labels are a valid BFS distance assignment") {
    val vis = AllPacks.queries("g10_khop_frontier")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vis.nonEmpty)
    // no duplicate nodes (the Map build would have collapsed them; check count)
    val n = AllPacks.queries("g10_khop_frontier")(spark, sf).count()
    assert(n == vis.size, "a node appears at more than one hop")
    // rebuild the same co-order adjacency the query uses
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey").cast("long"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(expr(
        "flatten(transform(ss, (a, i) -> transform(" +
          "slice(ss, i + 2, size(ss) - i - 1), " +
          "b -> named_struct('u', a, 'v', b))))")).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select(col("u"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // BFS property: every hop-h node (h>0) has a neighbor at hop h-1 and no
    // neighbor at hop < h-1; seeds are exactly the hop-0 nodes
    for ((node, hop) <- vis if hop > 0) {
      val nbrHops = adj.getOrElse(node, Set.empty).flatMap(vis.get)
      assert(nbrHops.contains(hop - 1), s"node $node at hop $hop lacks a hop-${hop - 1} neighbor")
      assert(!nbrHops.exists(_ < hop - 1), s"node $node at hop $hop touches hop < ${hop - 1}")
    }
    for ((node, hop) <- vis if hop == 0)
      assert(node % 97 == 0, s"non-seed $node at hop 0")
  }
}
