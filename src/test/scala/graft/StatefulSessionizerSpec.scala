package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{SessionEvent, StatefulSessionizer}

class StatefulSessionizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("flatMapGroupsWithState sessionizer closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    val out = StatefulSessionizer.sessionize(input.toDS(), gapSec = 1800)

    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    def m(s: String) = java.sql.Timestamp.valueOf(s).getTime
    // batch 1: one open session for u1 (2 events), one for u2
    input.addData(
      SessionEvent(1, m("2024-01-01 10:00:00")),
      SessionEvent(1, m("2024-01-01 10:10:00")),
      SessionEvent(2, m("2024-01-01 10:05:00"))
    )
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0) // nothing closed yet

    // batch 2: u1 returns after a 110-min gap -> session 1 closes
    input.addData(SessionEvent(1, m("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions_out")
      .as[graft.streaming.SessionOut].collect()
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.userId == 1 && s.n == 2 && s.durationSec == 600)
    assert(s.startMillis == m("2024-01-01 10:00:00"))
  }
}
