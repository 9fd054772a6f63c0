package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ConnectedComponents

/** Randomized differential for the contraction-based connected components:
  * on arbitrary graphs (random, chains, cliques, stars, self-loops,
  * duplicate and reversed edges) the distributed result must equal a
  * driver-side union-find ground truth. Deterministic seed — reproducible.
  */
class CcPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum representative
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("random graphs match union-find ground truth") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val n = 30 + trial * 17
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (rnd.nextBoolean()) (a, b) else (b, a) // random direction
      } ++ Seq((0L, 0L)) // self-loop must be a no-op
      val nodes = (0L until n.toLong).toDF("id")
      // alternate execution paths: even trials take the adaptive driver
      // finish (default guard), odd trials force the distributed
      // star-contraction loop (guard = 0) — both must match ground truth
      val guard = if (trial % 2 == 0) 1L << 22 else 0L
      val got = ConnectedComponents
        .run(nodes, edges.toDF("src", "dst"), driverFinishEdges = guard)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial (guard=$guard): n=$n edges=$edges")
    }
  }

  test("adversarial long chain (diameter >> pointer-jump depth)") {
    import spark.implicits._
    val n = 200L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(nodes, edges)
      .agg(countDistinct(col("component")), min(col("component"))).head()
    assert((got.getLong(0), got.getLong(1)) == ((1L, 0L)))
  }

  test("bytes-aware driver finish: correct on BOTH sides of the derived threshold") {
    import spark.implicits._
    // 50-node random graph; canonical distinct edge count E known exactly
    val rnd = new scala.util.Random(7)
    val n = 50
    val raw = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val canonical = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val e = canonical.size.toLong
    // per-edge estimate for (long, long): 2*(8+16) + 32 = 80 bytes
    val rowBytes = 80L
    val nodes = (0L until n.toLong).toDF("id")
    val want = unionFind(n, raw)
    // budget exactly E edges → remainder fits → driver union-find path
    val atThreshold = ConnectedComponents
      .run(nodes, raw.toDF("src", "dst"), driverFinishBytes = e * rowBytes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atThreshold == want)
    // one byte short of E edges → first round must run distributed
    val belowThreshold = ConnectedComponents
      .run(nodes, raw.toDF("src", "dst"), driverFinishBytes = e * rowBytes - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(belowThreshold == want)
  }

  test("disjoint cliques collapse in one round each") {
    import spark.implicits._
    val cliques = Seq(0L to 9L, 10L to 19L, 20L to 29L)
    val edges = cliques.flatMap(c => for (a <- c; b <- c if a < b) yield (a, b))
    val nodes = (0L until 30L).toDF("id")
    val got = ConnectedComponents.run(nodes, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = cliques.flatMap(c => c.map(_ -> c.head)).toMap
    assert(got == want)
  }
}
