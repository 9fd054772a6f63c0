package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoins

class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("§2.8: stream-stream interval join matches clicks before purchases") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val purchases = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoins.clicksBeforePurchase(
      purchases.toDF().toDF("user_id", "p_ts", "purchase_id"),
      clicks.toDF().toDF("c_uid", "c_ts")
    )

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()

    clicks.addData(
      (1L, t("2024-01-01 10:10:00")), // inside window of purchase A
      (1L, t("2024-01-01 09:00:00")), // too early for A
      (2L, t("2024-01-01 10:20:00")), // other user, inside B's window
      (1L, t("2024-01-01 10:40:00"))  // inside window of purchase A
    )
    purchases.addData(
      (1L, t("2024-01-01 10:45:00"), 100L), // A
      (2L, t("2024-01-01 10:30:00"), 200L), // B
      (3L, t("2024-01-01 10:30:00"), 300L)  // no clicks → no output (inner)
    )
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ssj_out")
      .select($"purchase_id", $"c_ts".cast("string"))
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      (100L, "2024-01-01 10:10:00"),
      (100L, "2024-01-01 10:40:00"),
      (200L, "2024-01-01 10:20:00")
    ))
  }
}
