package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TokenSets

/** TokenSets must return EXACTLY the brute-force all-pairs result in both
  * physical representations (64-bit bitmask for tiny vocabularies, sorted
  * int arrays otherwise) — the representation is an optimizer decision,
  * never a semantics change.
  */
class TokenSetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def brute(docs: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val rows = docs.select(col("id"), col("key"), array_distinct(split(col("text"), " ")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toSet))
    (for {
      (ai, ak, at) <- rows
      (bi, bk, bt) <- rows
      if ai < bi && ak == bk
      j = at.intersect(bt).size.toDouble / at.union(bt).size
      if j >= threshold
    } yield (ai, bi)).toSet
  }

  private def viaTokenSets(docs: DataFrame, threshold: Double): Set[(Long, Long)] =
    TokenSets.jaccardPairs(docs, "id", "key", split(col("text"), " "), threshold)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bitmask path (vocab <= 63) matches brute force") {
    import spark.implicits._
    // 10-word vocabulary → single-long bitmask representation
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    val docs = (0L until 40L).map { i =>
      val t = (0 until 6).map(k => words(((i / 4) * 2 + k * (1 + i % 4) / 2).toInt % words.length))
      (i, s"k${i % 2}", t.mkString(" "))
    }.toDF("id", "key", "text")
    assert(viaTokenSets(docs, 0.6) == brute(docs, 0.6))
    assert(viaTokenSets(docs, 0.6).nonEmpty) // the fixture must actually exercise pairs
  }

  test("int-array path (vocab > 63) matches brute force") {
    import spark.implicits._
    // 80-word vocabulary → sorted dictionary-id arrays + merge intersect
    val docs = (0L until 40L).map { i =>
      val t = (0 until 10).map(k => s"w${(i * 3 + k * (1 + (i % 3))) % 80}")
      (i, "k", t.mkString(" "))
    }.toDF("id", "key", "text")
    assert(viaTokenSets(docs, 0.5) == brute(docs, 0.5))
    assert(viaTokenSets(docs, 0.5).nonEmpty)
  }

  test("jaccard values are the exact integer-derived doubles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "k", "a b c d e"),
      (2L, "k", "a b c d f"), // inter 4, union 6 → 4/6
      (3L, "k", "a b c d e")  // dup of 1 → 1.0
    ).toDF("id", "key", "text")
    val got = TokenSets.jaccardPairs(docs, "id", "key", split(col("text"), " "), 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got == Map((1L, 2L) -> 4.0 / 6, (1L, 3L) -> 1.0, (2L, 3L) -> 4.0 / 6))
  }
}
