package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CotStream

/** §2.8 trigger semantics: the reference's scheduled incoming pull
  * (`task.ts:51` — invoke, drain everything available, exit) maps to
  * `Trigger.AvailableNow()` over a queue-backed source. Spark's built-in
  * file source IS the idiomatic queue here (append-only directory of
  * NDJSON bodies, exactly-once file tracking via the checkpoint) — no
  * custom source needed, per SURVEY §7.3's custom-vs-built-in table.
  */
class FileQueueStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("AvailableNow drains the file queue through the outgoing pipeline, then stops") {
    val dir = java.nio.file.Files.createTempDirectory("graft_queue").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def body(id: String, geom: String, callsign: String): String = {
      val cs = if (callsign == null) "null" else s"""\\"$callsign\\""""
      s"""{"value":"{\\"xml\\":\\"<event/>\\",\\"geojson\\":{\\"id\\":\\"$id\\",\\"type\\":\\"Feature\\",\\"properties\\":{\\"callsign\\":$cs,\\"time\\":\\"2024-01-01T10:00:00Z\\",\\"start\\":\\"2024-01-01T10:00:00Z\\",\\"stale\\":\\"2024-01-01T11:00:00Z\\"},\\"geometry\\":{\\"type\\":\\"$geom\\",\\"coordinates\\":[1.0,2.0]}}}"}"""
    }
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    def drainOnce(): Unit = {
      val raw = spark.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .json(dir)
      val q = CotStream.outgoing(raw)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", outDir)
        .start()
      q.awaitTermination(60000) // AvailableNow terminates after draining
      assert(!q.isActive, "AvailableNow query should stop by itself")
    }
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "batch0.json"),
        Seq(
          body("uid-1", "Point", "ALPHA"),
          body("uid-2", "LineString", null), // callsign default kicks in
          body("uid-3", "Polygon", "CHARLIE"),
          body("uid-4", "MultiPoint", "SKIP") // unconfigured type → routed out
        ).mkString("\n")
      )
      drainOnce()
      def sinkRows: Set[(String, String, String)] =
        spark.read.parquet(outDir)
          .select(col("cotuid"), col("callsign"), col("gtype"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(sinkRows == Set(
        ("uid-1", "ALPHA", "Point"),
        ("uid-2", "Unknown", "LineString"), // P2 default
        ("uid-3", "CHARLIE", "Polygon")
      )) // uid-4 skipped by P3 routing

      // restart from the same checkpoint: already-seen files are NOT
      // re-emitted (exactly-once file tracking) even though they still exist
      drainOnce()
      assert(sinkRows.size == 3, s"restart duplicated rows: $sinkRows")

      // only genuinely new queue files are picked up on the next pull
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "batch1.json"),
        body("uid-5", "Point", "ECHO")
      )
      drainOnce()
      assert(sinkRows.contains(("uid-5", "ECHO", "Point")) && sinkRows.size == 4, sinkRows.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt)); rm(new java.io.File(outDir))
    }
  }
}
