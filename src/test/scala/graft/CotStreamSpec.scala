package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Merge
import graft.streaming.CotStream

class CotStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def body(id: String, callsign: String, gtype: String, stale: String,
      remarks: String = null): String = {
    val cs = Option(callsign).map(c => s""""callsign":"$c",""").getOrElse("")
    val rm = Option(remarks).map(r => s""""remarks":"$r",""").getOrElse("")
    s"""{"xml":"<event/>","geojson":{"id":"$id","type":"Feature",
       |"properties":{$cs$rm"type":"a-f-G","how":"m-g",
       |"time":"2024-01-01T00:00:00Z","start":"2024-01-01T00:00:00Z","stale":"$stale"},
       |"geometry":{"type":"$gtype","coordinates":[1.0,2.0]}}}""".stripMargin.replace("\n", "")
  }

  test("outgoing pipeline: parse, project with P2 defaults, route, dedup, foreachBatch upsert") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val input = MemoryStream[String]
    val stream = CotStream.outgoing(input.toDF().withColumnRenamed("value", "value"))

    // sink state (the "target layer"): driver-side var updated by foreachBatch merge
    var target: DataFrame = Seq.empty[(String, String, String)]
      .toDF("cotuid", "callsign", "remarks")

    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // A2 in-batch first-match dedup, then J1 upsert (cross-batch
        // duplicates ARE the updates — last-write-wins via merge)
        val b = Merge.dedupFirst(
          batch.select("cotuid", "callsign", "remarks"), "cotuid", Seq("callsign"))
        target = Merge.upsert(target, b, "cotuid").drop("merge_action")
        target.cache().count() // materialize: avoid re-reading the streaming batch later
        ()
      }
      .start()

    // batch 1: one normal feature, one missing callsign (P2 default), one
    // unconfigured geometry type (skipped), one duplicate id (deduped)
    input.addData(
      body("uid-1", "ALPHA", "Point", "2024-01-01T01:00:00Z"),
      body("uid-2", null, "Point", "2024-01-01T01:00:00Z"),
      body("uid-3", "GHOST", "MultiPoint", "2024-01-01T01:00:00Z"),
      body("uid-1", "ALPHA-DUP", "Point", "2024-01-01T01:00:00Z")
    )
    q.processAllAvailable()

    val after1 = target.orderBy("cotuid").collect()
    assert(after1.map(_.getString(0)).toSeq == Seq("uid-1", "uid-2"))
    // P2 insert defaults: missing callsign -> 'Unknown', missing remarks -> ''
    assert(after1.find(_.getString(0) == "uid-2").get.getString(1) == "Unknown")
    assert(after1.forall(_.getString(2) == ""))

    // batch 2: update to uid-1 (J1 update branch) + brand-new uid-4
    input.addData(
      body("uid-1", "ALPHA-2", "Point", "2024-01-01T02:00:00Z", remarks = "moved"),
      body("uid-4", "DELTA", "LineString", "2024-01-01T02:00:00Z")
    )
    q.processAllAvailable()
    q.stop()

    val after2 = target.orderBy("cotuid").collect()
    assert(after2.map(_.getString(0)).toSeq == Seq("uid-1", "uid-2", "uid-4"))
    assert(after2.find(_.getString(0) == "uid-1").get.getString(1) == "ALPHA-2")
    assert(after2.find(_.getString(0) == "uid-1").get.getString(2) == "moved")
  }

  test("stale column drives the watermark (event-time bound on dedup state)") {
    val parsed = CotStream.projectCotAttributes(
      CotStream.parseBodies(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row(body("u1", "A", "Point", "2024-01-01T05:00:00Z"))
          )),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType)))
        )
      )
    )
    val stale = parsed.select("stale").head().getTimestamp(0)
    assert(stale.toInstant.toString == "2024-01-01T05:00:00Z")
  }
}
