package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark's native session_window operator (§2.8) — checked two ways:
  * batch, as a differential against the manual lag+running-sum
  * sessionization (the e3 oracle formulation); and streaming, where the
  * watermark closes sessions across micro-batches in append mode.
  */
class SessionWindowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("batch session_window equals manual lag-based sessionization on the corpus") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")

    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))

    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val manual = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >= 1800, 1L)
          .otherwise(0L)
      )
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))

    // session_window merges events with gap < 30min (strict); the manual
    // twin above uses >= 1800 as the break for the same strictness
    val a = native.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val b = manual.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(a == b, s"native=${a.size} sessions, manual=${b.size}")
    assert(a.nonEmpty)
  }

  test("streaming session_window: watermark closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val sessions = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))

    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two events 10 min apart -> ONE session; user 2 separate
    input.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:10:00"), 1L))
    q.processAllAvailable()
    input.addData((t("2024-01-01 10:20:00"), 2L))
    q.processAllAvailable()
    // advance event time far enough that the 30-min-gap sessions + 10-min
    // watermark all close
    input.addData((t("2024-01-01 12:00:00"), 99L))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out")
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 99's session is still open (nothing advanced the watermark past it)
    assert(out == Set((1L, 2L), (2L, 1L)))
  }
}
