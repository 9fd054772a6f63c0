package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Aggregates

class CappedHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Misra-Gries guarantees hold under distributed merge") {
    import spark.implicits._
    val cap = 50
    // 600 rows x ~50 tokens across 8 partitions: 'hot' ~30%, 'warm' ~10%,
    // tail spread over 2000 distinct terms
    val rows: Seq[Seq[String]] = (0 until 600).map { r =>
      (0 until 50).map { i =>
        val u = (r * 50 + i) % 100
        if (u < 30) "hot"
        else if (u < 40) "warm"
        else s"t${(r * 131 + i * 7919) % 2000}"
      }
    }
    val df = rows.toDF("toks").repartition(8)

    val capped = udaf(new Aggregates.TopKTermsCapped(10, cap))
    val got = df.agg(capped($"toks").as("top")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1))

    val truth = df.select(explode($"toks").as("t")).groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val slack = n / (cap + 1)

    // genuinely heavy terms must be found, and ranked first
    assert(got.take(2).map(_._1).toSet == Set("hot", "warm"), got.toString)
    got.foreach { case (t, est) =>
      val actual = truth.getOrElse(t, 0L)
      assert(est <= actual, s"$t overcounted: $est > $actual")
      assert(est >= actual - slack, s"$t undercounted beyond N/cap: $est < $actual - $slack")
    }
    // buffer boundedness is structural (cap enforced in reduce/merge); the
    // heavy counts must also be close: hot is 30% of N >> slack
    val hotEst = got.toMap.apply("hot")
    assert(hotEst >= truth("hot") - slack && hotEst > n / 5, s"hot=$hotEst of ${truth("hot")}")
  }
}
