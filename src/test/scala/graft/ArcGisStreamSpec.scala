package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.arcgis._

/** Incremental streaming read of an ArcGIS layer: the micro-batch source
  * tails the layer by OBJECTID (offset = highest OID delivered), so a
  * scheduled re-pull becomes exactly-once incremental delivery.
  */
class ArcGisStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fields = Seq(
    ArcGisField("objectid", "esriFieldTypeOID"),
    ArcGisField("name", "esriFieldTypeString"),
    ArcGisField("status", "esriFieldTypeString"))

  private def feat(i: Long, status: String = "active") = EsriFeature(
    Map("objectid" -> i, "name" -> s"feat-$i", "status" -> status), Some((i * 1.0, -i * 1.0)))

  /** Mock whose row set can GROW between micro-batches. */
  private class GrowingMock(initial: Seq[EsriFeature])
      extends MockArcGisClient(fields, initial, pageSize = 4) {
    @volatile private var extra: Seq[EsriFeature] = Seq.empty
    def grow(more: Seq[EsriFeature]): Unit = extra = extra ++ more
    override def queryPage(offset: Long, count: Int, where: String,
        outFields: Seq[String], envelope: Option[Envelope]): Seq[EsriFeature] = {
      val self = new MockArcGisClient(fields, rows ++ extra, pageSize)
      self.queryPage(offset, count, where, outFields, envelope)
    }
    override def queryStatistics(where: String, groupBy: Seq[String],
        stats: Seq[StatSpec]): Seq[Map[String, Any]] =
      new MockArcGisClient(fields, rows ++ extra, pageSize)
        .queryStatistics(where, groupBy, stats)
  }

  test("micro-batch tail: backfill then ONLY new OIDs, exactly once") {
    val client = new GrowingMock((0L until 10L).map(feat(_)))
    ArcGisClientRegistry.register("stream10", client)
    val q = spark.readStream.format("arcgis").option("client", "stream10").load()
      .writeStream.format("memory").queryName("arcstream")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val batch1 = spark.sql("SELECT objectid FROM arcstream").collect().map(_.getLong(0)).sorted
      assert(batch1.toSeq == (0L until 10L), "backfill must deliver the whole layer once")

      client.grow(Seq(feat(10), feat(11), feat(12)))
      q.processAllAvailable()
      val all = spark.sql("SELECT objectid FROM arcstream").collect().map(_.getLong(0)).sorted
      // incremental: the original 10 are NOT re-delivered
      assert(all.toSeq == (0L until 13L), all.toSeq.toString)
    } finally q.stop()
  }

  test("where option applies server-side to every micro-batch") {
    val client = new GrowingMock((0L until 8L).map(i =>
      feat(i, status = if (i % 2 == 0) "active" else "idle")))
    ArcGisClientRegistry.register("streamwhere", client)
    val q = spark.readStream.format("arcgis").option("client", "streamwhere")
      .option("where", "status = 'active'").load()
      .writeStream.format("memory").queryName("arcstreamw")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT objectid FROM arcstreamw").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(0L, 2L, 4L, 6L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains to the prepare-time watermark and terminates") {
    val client = new GrowingMock((0L until 6L).map(feat(_)))
    ArcGisClientRegistry.register("streamnow", client)
    val q = spark.readStream.format("arcgis").option("client", "streamnow").load()
      .writeStream.format("memory").queryName("arcstreamnow")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow query must terminate on its own")
    val got = spark.sql("SELECT objectid FROM arcstreamnow").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 6L))
  }

  test("restart from checkpoint resumes at the stored offset — no re-delivery") {
    val client = new GrowingMock((0L until 5L).map(feat(_)))
    ArcGisClientRegistry.register("streamckpt", client)
    val ckpt = java.nio.file.Files.createTempDirectory("arcgis-stream-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("arcgis-stream-out").toString
    def runOnce(): Unit = {
      // file sink: the one memoryless sink that supports checkpoint recovery
      val q = spark.readStream.format("arcgis").option("client", "streamckpt").load()
        .select(col("objectid"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000))
    }
    def delivered(): Seq[Long] =
      spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    runOnce()
    assert(delivered() == (0L until 5L))
    // stop-the-world; new rows arrive; a FRESH query restarts from the
    // checkpointed offset — the first 5 OIDs must NOT be re-delivered
    client.grow(Seq(feat(5), feat(6)))
    runOnce()
    assert(delivered() == (0L until 7L), "exactly-once across restart: no dup, no loss")
  }

  test("writeStream.format(\"arcgis\"): streaming upsert sink, idempotent on the key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val target = new GrowingMock((0L until 3L).map(feat(_))) // feat-0..2 exist
    ArcGisClientRegistry.register("streamsink", target)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val df = in.toDF().toDF("name", "status")
    val q = df.writeStream.format("arcgis")
      .option("client", "streamsink").option("upsertKey", "name")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("arcgis-sink-ckpt").toString)
      .outputMode("append").start()
    try {
      in.addData(("feat-1", "updated"), ("feat-99", "new"))
      q.processAllAvailable()
      // existing name → updateFeatures with its objectid; new name → addFeatures
      val upd = target.updated.toArray.map(_.asInstanceOf[EsriFeature])
      assert(upd.map(_.attributes("name")).toSeq == Seq("feat-1"))
      assert(upd.head.attributes("objectid").asInstanceOf[Number].longValue() == 1L)
      assert(target.added.toArray.map(_.asInstanceOf[EsriFeature].attributes("name")).toSeq
        == Seq("feat-99"))
      assert(ArcGisWriteStats.last("streamsink").contains((1L, 0L, 1L)))
    } finally q.stop()
  }

  private val editFields = fields :+ ArcGisField("edited", "esriFieldTypeDate")

  private def editFeat(i: Long, status: String, ts: Long) = EsriFeature(
    Map("objectid" -> i, "name" -> s"feat-$i", "status" -> status, "edited" -> ts),
    Some((i * 1.0, -i * 1.0)))

  /** Mock layer with edit tracking: rows can be edited IN PLACE (same OID,
    * bumped `edited` timestamp) or inserted, as ArcGIS edit sessions do.
    */
  private class EditableMock(initial: Seq[EsriFeature])
      extends MockArcGisClient(editFields, initial, pageSize = 4) {
    @volatile private var current: Seq[EsriFeature] = initial
    def upsert(i: Long, status: String, ts: Long): Unit = synchronized {
      current = current.filterNot(
        _.attributes("objectid").asInstanceOf[Number].longValue() == i) :+
        editFeat(i, status, ts)
    }
    private def live = new MockArcGisClient(editFields, current, pageSize)
    override def queryPage(offset: Long, count: Int, where: String,
        outFields: Seq[String], envelope: Option[Envelope]): Seq[EsriFeature] =
      live.queryPage(offset, count, where, outFields, envelope)
    override def queryStatistics(where: String, groupBy: Seq[String],
        stats: Seq[StatSpec]): Seq[Map[String, Any]] =
      live.queryStatistics(where, groupBy, stats)
  }

  test("incremental=editDate: backfill, then in-place EDITS are re-delivered") {
    // the reference re-pulls the whole layer each scheduled run and the
    // downstream upsert reconciles (task.ts:51); editDate mode re-observes
    // the same edits while transferring only the changed rows
    val client = new EditableMock((0L until 5L).map(i => editFeat(i, "active", 100L + i)))
    ArcGisClientRegistry.register("streamedit", client)
    val q = spark.readStream.format("arcgis").option("client", "streamedit")
      .option("incremental", "editDate").option("editDateField", "edited").load()
      .writeStream.format("memory").queryName("arcstreamedit")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val backfill = spark.sql("SELECT objectid, status FROM arcstreamedit").collect()
      assert(backfill.map(_.getLong(0)).sorted.toSeq == (0L until 5L),
        "backfill must deliver the whole layer once")

      // quiet window: nothing re-delivered while nothing is edited
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM arcstreamedit").count() == 5L)

      // one in-place edit + one insert, both past the delivered watermark
      client.upsert(2L, "updated", 500L)
      client.upsert(5L, "new", 501L)
      q.processAllAvailable()
      val rows = spark.sql("SELECT objectid, status FROM arcstreamedit").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      // 5 backfill + exactly the 2 changed rows — unedited rows NOT resent
      assert(rows.size == 7, rows.toString)
      assert(rows.count { case (oid, st) => oid == 2L && st == "updated" } == 1,
        "the in-place edit must be re-delivered with its new attributes")
      assert(rows.contains((5L, "new")))
    } finally q.stop()
  }

  test("incremental=editDate without editDateField fails fast") {
    val client = new EditableMock(Seq(editFeat(0L, "active", 1L)))
    ArcGisClientRegistry.register("streameditbad", client)
    val stream = new ArcGisMicroBatchStream(
      new org.apache.spark.sql.types.StructType(),
      Map("client" -> "streameditbad", "incremental" -> "editDate"),
      "1=1")
    val e = intercept[IllegalArgumentException](stream.initialOffset())
    assert(e.getMessage.contains("editDateField"))
  }

  test("offset round-trips through JSON (checkpoint format)") {
    val off = ArcGisOffset(12345L)
    assert(ArcGisOffset.fromJson(off.json()) == off)
    assert(ArcGisOffset.fromJson("""{"maxOid":-9}""") == ArcGisOffset(-9L))
    intercept[IllegalArgumentException](ArcGisOffset.fromJson("""{"bogus":1}"""))
  }
}
