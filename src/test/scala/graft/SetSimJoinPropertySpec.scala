package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SetSimJoin

/** Randomized differential for the df-pruned, prefix-filtered set-similarity
  * join: on arbitrary corpora the verified pairs must contain EVERY pair a
  * brute-force all-pairs intersection finds at the threshold — for both the
  * symmetric (Jaccard) and directed (containment) predicates the helper
  * serves — and every reported intersection count must be exact.
  * Deterministic seed — reproducible.
  */
class SetSimJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val t = 0.5

  /** Random corpora tuned to stress the prunes: small vocab → hot shingles
    * (prefix filter under load), varied sizes → asymmetric containment,
    * multiple blocks, duplicate docs, singleton-heavy tails (df=1 prune).
    */
  private def corpus(seed: Int): Seq[(Long, String, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    val vocabHot = (0 until 8).map(i => s"hot$i")
    val vocabCold = (0 until 200).map(i => s"cold$i")
    (0 until 60).map { i =>
      val block = s"b${rnd.nextInt(3)}"
      val size = 1 + rnd.nextInt(12)
      val sh = Seq.fill(size)(
        if (rnd.nextBoolean()) vocabHot(rnd.nextInt(vocabHot.size))
        else vocabCold(rnd.nextInt(vocabCold.size))).distinct
      (i.toLong, block, sh)
    } ++ Seq(
      (1000L, "b0", Seq("hot0", "hot1", "hot2")), // exact duplicate pair
      (1001L, "b0", Seq("hot0", "hot1", "hot2")),
      (1002L, "b1", Seq("only-once")) // pure-singleton doc: no pairs
    )
  }

  private def brute(docs: Seq[(Long, String, Seq[String])]) =
    for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      inter = a._3.toSet.intersect(b._3.toSet).size
      if inter > 0
    } yield ((a._1, b._1), (a._3.size, b._3.size, inter))

  test("verified pairs cover every brute-force pair at the threshold, counts exact") {
    import spark.implicits._
    for (seed <- Seq(11, 23, 47)) {
      val docs = corpus(seed)
      val df = docs.toDF("doc_id", "source", "sh")
      val got = SetSimJoin.verifiedPairs(df, t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getInt(2), r.getInt(3), r.getLong(4).toInt)))
        .toMap
      val all = brute(docs).toMap
      // every reported count is exact
      got.foreach { case (k, v) =>
        assert(all.get(k).contains(v), s"seed=$seed pair=$k got=$v want=${all.get(k)}")
      }
      // completeness for symmetric Jaccard >= t
      val wantJ = all.filter { case (_, (na, nb, i)) => i.toDouble / (na + nb - i) >= t }
      wantJ.keys.foreach { k =>
        assert(got.contains(k), s"seed=$seed: jaccard>=$t pair $k missing from candidates")
      }
      // completeness for DIRECTED containment >= t on either side
      val wantC = all.filter { case (_, (na, nb, i)) =>
        i.toDouble / na >= t || i.toDouble / nb >= t
      }
      wantC.keys.foreach { k =>
        assert(got.contains(k), s"seed=$seed: containment>=$t pair $k missing from candidates")
      }
    }
  }

  test("df=1 shingles produce no pairs and drop from the index exactly") {
    import spark.implicits._
    // every shingle unique to its doc → zero pairs despite shared-size docs
    val docs = (0L until 10L).map(i => (i, "b", Seq(s"u${i}a", s"u${i}b")))
    val out = SetSimJoin.verifiedPairs(docs.toDF("doc_id", "source", "sh"), t)
    assert(out.isEmpty)
  }
}
