package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{HeavyHitterUpdate, StreamingHeavyHitters}

class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bounded state carries heavy terms across micro-batches with MG guarantees") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val cap = 8
    val input = MemoryStream[(String, String)]
    val docs = input.toDS().toDF("lang", "text")
    val out = StreamingHeavyHitters.run(docs, "lang", "text", k = 3, cap = cap)

    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_updates").start()

    // batch 1: 'spark' dominates; plenty of singleton noise to pressure the cap
    input.addData(
      ("en", "spark spark spark spark spark alpha beta gamma"),
      ("en", "spark spark spark delta epsilon zeta eta theta"))
    q.processAllAvailable()
    val b1 = spark.table("hh_updates").as[HeavyHitterUpdate].collect()
      .filter(_.group == "en").maxBy(_.total)
    assert(b1.total == 16L)
    assert(b1.top.head.term == "spark")
    // MG bounds: never overcount; undercount at most N/cap
    assert(b1.top.head.n <= 8L && b1.top.head.n >= 8L - b1.total / cap)

    // batch 2: a NEW heavy term arrives after the cap was already stressed;
    // 'spark' history must survive in the bounded summary
    input.addData(
      ("en", "flink flink flink flink flink flink iota kappa"),
      ("en", "spark spark mu nu xi omicron pi rho"))
    q.processAllAvailable()
    q.stop()

    val b2 = spark.table("hh_updates").as[HeavyHitterUpdate].collect()
      .filter(_.group == "en").maxBy(_.total)
    assert(b2.total == 32L)
    val reported = b2.top.map(t => t.term -> t.n).toMap
    // true counts: spark=10, flink=6 over N=32; both exceed N/cap=4 -> both
    // MUST be present (no false negatives among genuinely heavy terms)
    assert(reported.contains("spark"), b2.top.mkString(", "))
    assert(reported.contains("flink"), b2.top.mkString(", "))
    assert(reported("spark") <= 10L && reported("spark") >= 10L - b2.total / cap)
    assert(reported("flink") <= 6L && reported("flink") >= 6L - b2.total / cap)
    // deterministic ordering: count desc, term asc
    assert(b2.top.head.term == "spark")
  }

  test("state stays bounded and groups are independent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val cap = 4
    val input = MemoryStream[(String, String)]
    val out = StreamingHeavyHitters.run(
      input.toDS().toDF("lang", "text"), "lang", "text", k = 4, cap = cap)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_bounded").start()

    // 40 distinct singleton terms per group — far beyond cap
    val noiseA = (1 to 40).map(i => ("a", s"worda$i")).grouped(8).map(g =>
      ("a", g.map(_._2).mkString(" "))).toSeq
    val noiseB = Seq(("b", "bee bee bee bee bee unique1 unique2 unique3"))
    input.addData(noiseA ++ noiseB: _*)
    q.processAllAvailable()
    q.stop()

    val ups = spark.table("hh_bounded").as[HeavyHitterUpdate].collect()
    val a = ups.filter(_.group == "a").maxBy(_.total)
    val b = ups.filter(_.group == "b").maxBy(_.total)
    // summary respects the cap even under pure-singleton pressure
    assert(a.top.size <= cap)
    assert(a.total == 40L)
    // group b is unaffected by group a's noise; its heavy term survives
    assert(b.total == 8L)
    assert(b.top.head.term == "bee")
    assert(b.top.head.n <= 5L && b.top.head.n >= 5L - b.total / cap)
  }
}
