package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.KCore

/** Randomized differential for the distributed k-core peel: on arbitrary
  * undirected graphs the round-synchronous DataFrame peel must match a
  * driver-side brute-force peel round for round, and the fixpoint must
  * satisfy the k-core invariant (every surviving node has ≥ k surviving
  * neighbors; the removed nodes cannot be re-added). Deterministic seed.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Driver-side round-synchronous peel: one round removes ALL nodes whose
    * current degree is < k (same semantics as the distributed version).
    */
  private def bruteRounds(adj: Set[(Long, Long)], k: Int, rounds: Int): Set[Long] = {
    var alive: Set[Long] = adj.map(_._1)
    for (_ <- 1 to rounds) {
      val deg = adj.toSeq
        .filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (a, es) => a -> es.size }
      alive = alive.filter(a => deg.getOrElse(a, 0) >= k)
    }
    alive
  }

  private def bruteFix(adj: Set[(Long, Long)], k: Int): Set[Long] = {
    var prev = adj.map(_._1)
    var cur = bruteRounds(adj, k, 1)
    while (cur != prev) { prev = cur; cur = bruteRounds(adj.filter { case (a, b) => cur(a) && cur(b) }, k, 1) }
    cur
  }

  private def randomAdj(rnd: scala.util.Random, n: Int, m: Int): Set[(Long, Long)] = {
    val und = Seq.fill(m) {
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.toSet
    und ++ und.map { case (a, b) => (b, a) }
  }

  test("fixed-round peel matches brute force on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 20 + trial * 13
      val adj = randomAdj(rnd, n, n * 2)
      val adjDf = adj.toSeq.toDF("a", "b")
      for (k <- Seq(2, 3); rounds <- Seq(1, 3)) {
        val got = KCore.peel(adjDf, k, rounds).as[Long].collect().toSet
        val want = bruteRounds(adj, k, rounds)
        assert(got == want, s"trial=$trial k=$k rounds=$rounds")
      }
    }
  }

  test("fixpoint core satisfies the k-core invariant and matches brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 25 + trial * 10
      val adj = randomAdj(rnd, n, n * 3)
      val adjDf = adj.toSeq.toDF("a", "b")
      val k = 3
      val core = KCore.core(adjDf, k).as[Long].collect().toSet
      assert(core == bruteFix(adj, k), s"trial=$trial")
      // invariant: every survivor keeps ≥ k surviving neighbors
      val degs = KCore.degreesWithin(adjDf, core.toSeq.toDF("a"))
        .as[(Long, Long)].collect().toMap
      assert(core.forall(a => degs.getOrElse(a, 0L) >= k))
      // monotonicity: k-core ⊆ (k-1)-core
      val weaker = KCore.core(adjDf, k - 1).as[Long].collect().toSet
      assert(core.subsetOf(weaker))
    }
  }

  test("clique minus one edge: 4-core dissolves, 3-core survives") {
    import spark.implicits._
    // K5 with one edge removed: two nodes have degree 3, the rest 4 —
    // the 4-core peels to nothing (removing the degree-3 pair drops the
    // others below 4), while the 3-core keeps all five nodes.
    val und = (for { a <- 0L until 5L; b <- 0L until 5L if a < b } yield (a, b))
      .filterNot { case (a, b) => a == 3L && b == 4L }.toSet
    val adj = (und ++ und.map { case (a, b) => (b, a) }).toSeq.toDF("a", "b")
    assert(KCore.core(adj, 4).count() == 0L)
    assert(KCore.core(adj, 3).as[Long].collect().toSet == Set(0L, 1L, 2L, 3L, 4L))
  }
}
