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
        outFields: Seq[String], envelope: Option[Envelope],
        outSR: Option[String]): Seq[EsriFeature] = {
      val self = new MockArcGisClient(fields, rows ++ extra, pageSize)
      self.queryPage(offset, count, where, outFields, envelope, outSR)
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
      assert(ArcGisWriteStats.last("streamsink").contains((1L, 0L, 1L, 0L)))
    } finally q.stop()
  }

  private val editFields = fields :+ ArcGisField("edited", "esriFieldTypeDate")

  private def editFeat(i: Long, status: String, ts: Long) = EsriFeature(
    Map("objectid" -> i, "name" -> s"feat-$i", "status" -> status, "edited" -> ts),
    Some((i * 1.0, -i * 1.0)))

  /** Mock layer with edit tracking: rows can be edited IN PLACE (same OID,
    * bumped `edited` timestamp), inserted, or DELETED (recorded in the
    * change-tracking journal), as ArcGIS edit sessions do.
    */
  private class EditableMock(initial: Seq[EsriFeature])
      extends MockArcGisClient(editFields, initial, pageSize = 4) {
    @volatile private var current: Seq[EsriFeature] = initial
    def upsert(i: Long, status: String, ts: Long): Unit = synchronized {
      current = current.filterNot(
        _.attributes("objectid").asInstanceOf[Number].longValue() == i) :+
        editFeat(i, status, ts)
    }
    /** Server-side delete: the row vanishes from the layer and the change
      * journal records `(oid, ts)` — what `extractChanges` would surface.
      */
    def delete(i: Long, ts: Long): Unit = synchronized {
      current = current.filterNot(
        _.attributes("objectid").asInstanceOf[Number].longValue() == i)
      deletedLog.add((i, ts))
    }
    private def live = new MockArcGisClient(editFields, current, pageSize)
    override def queryPage(offset: Long, count: Int, where: String,
        outFields: Seq[String], envelope: Option[Envelope],
        outSR: Option[String]): Seq[EsriFeature] = {
      whereLog.add(where) // the delegate is throwaway — capture on THIS mock
      live.queryPage(offset, count, where, outFields, envelope, outSR)
    }
    override def queryStatistics(where: String, groupBy: Seq[String],
        stats: Seq[StatSpec]): Seq[Map[String, Any]] = {
      whereLog.add(where)
      live.queryStatistics(where, groupBy, stats)
    }
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
    // mode-tagged form: editDate offsets carry their mode; legacy maxOid
    // form reads back as oid-mode
    val edited = ArcGisOffset(987L, "editDate")
    assert(ArcGisOffset.fromJson(edited.json()) == edited)
    assert(ArcGisOffset.fromJson("""{"maxOid":7}""").mode == "oid")
  }

  test("checkpoint offset resumed under the WRONG incremental mode fails fast") {
    val client = new EditableMock(Seq(editFeat(0L, "active", 1L)))
    ArcGisClientRegistry.register("streammode", client)
    val editStream = new ArcGisMicroBatchStream(
      new org.apache.spark.sql.types.StructType(),
      Map("client" -> "streammode", "incremental" -> "editDate",
        "editDateField" -> "edited"),
      "1=1")
    // a legacy/oid checkpoint under editDate: the OID would be misread as
    // epoch-millis and the whole layer re-delivered — must throw instead
    val e = intercept[IllegalArgumentException](
      editStream.deserializeOffset("""{"maxOid":42}"""))
    assert(e.getMessage.contains("oid-mode"))
    val oidStream = new ArcGisMicroBatchStream(
      new org.apache.spark.sql.types.StructType(),
      Map("client" -> "streammode"), "1=1")
    val e2 = intercept[IllegalArgumentException](
      oidStream.deserializeOffset("""{"mode":"editDate","wm":42}"""))
    assert(e2.getMessage.contains("editDate-mode"))
    // matching modes deserialize fine
    assert(oidStream.deserializeOffset("""{"maxOid":42}""")
      == ArcGisOffset(42L))
    assert(editStream.deserializeOffset("""{"mode":"editDate","wm":42}""")
      == ArcGisOffset(42L, "editDate"))
  }

  test("deletes=true: upstream deletions arrive as tombstones, exactly once") {
    val client = new EditableMock((0L until 4L).map(i => editFeat(i, "active", 100L + i)))
    ArcGisClientRegistry.register("streamdel", client)
    val q = spark.readStream.format("arcgis").option("client", "streamdel")
      .option("incremental", "editDate").option("editDateField", "edited")
      .option("deletes", "true").load()
      .writeStream.format("memory").queryName("arcstreamdel")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val backfill = spark.sql("SELECT objectid, _deleted FROM arcstreamdel").collect()
      assert(backfill.map(_.getLong(0)).sorted.toSeq == (0L until 4L))
      assert(backfill.forall(!_.getBoolean(1)), "live rows carry _deleted=false")

      // server-side delete of a delivered row; a window where ONLY the
      // deletion happened must still advance the watermark and surface it
      client.delete(2L, 500L)
      q.processAllAvailable()
      val tombs = spark.sql(
        "SELECT objectid, name, _deleted FROM arcstreamdel WHERE _deleted").collect()
      assert(tombs.length == 1, s"exactly one tombstone, got ${tombs.length}")
      assert(tombs.head.getLong(0) == 2L)
      assert(tombs.head.isNullAt(1), "tombstone attributes are null")

      // quiet trigger: the tombstone is NOT re-delivered
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM arcstreamdel WHERE _deleted").count() == 1L)

      // a later edit + delete in the same window: both delivered once
      client.upsert(0L, "updated", 600L)
      client.delete(3L, 601L)
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM arcstreamdel WHERE _deleted").count() == 2L)
      assert(spark.sql(
        "SELECT * FROM arcstreamdel WHERE objectid = 0 AND status = 'updated'")
        .count() == 1L)
    } finally q.stop()
  }

  test("END-TO-END sync: source tombstones drive sink deleteFeatures exactly once") {
    // the reference's implicit delete semantics (full re-pull -> vanished
    // rows stop being re-sent -> downstream forgets them), made explicit:
    // incremental source with deletes=true -> key derivation -> upsert sink
    // with _deleted routing. The tombstone carries only the source OID, so
    // the pipeline derives the sync key from it (the T1 namespacing shape).
    val source = new EditableMock((0L until 4L).map(i => editFeat(i, "active", 100L + i)))
    ArcGisClientRegistry.register("e2esrc", source)
    val target = new GrowingMock((0L until 4L).map(feat(_))) // feat-0..3 live on target
    ArcGisClientRegistry.register("e2edst", target)
    val q = spark.readStream.format("arcgis").option("client", "e2esrc")
      .option("incremental", "editDate").option("editDateField", "edited")
      .option("deletes", "true").load()
      .select(
        concat(lit("feat-"), col("objectid")).as("name"), // sync key from OID
        col("status"), col("_deleted"))
      .writeStream.format("arcgis")
      .option("client", "e2edst").option("upsertKey", "name")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("arcgis-e2e-ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // backfill upserts feat-0..3
      source.delete(2L, 500L)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(target.deletedByClient.asScala.toSeq == Seq(2L),
        "the tombstone must delete exactly the matching target OID, once")
      // quiet trigger: no re-delete
      q.processAllAvailable()
      assert(target.deletedByClient.asScala.toSeq == Seq(2L))
    } finally q.stop()
  }

  test("sink delete of an unknown key is an idempotent no-op") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val target = new GrowingMock((0L until 2L).map(feat(_)))
    ArcGisClientRegistry.register("delnoop", target)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("status", StringType),
      StructField("_deleted", BooleanType, nullable = false)))
    val rows = Seq(
      Row("feat-1", null, true), // live on target -> deleted
      Row("ghost", null, true), // unknown key -> no-op, not an error
      Row("feat-0", "still-here", false)) // live row -> plain upsert
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.format("arcgis").option("client", "delnoop")
      .option("upsertKey", "name").mode("append").save()
    import scala.jdk.CollectionConverters._
    assert(target.deletedByClient.asScala.toSeq == Seq(1L))
    assert(ArcGisWriteStats.last("delnoop").contains((0L, 0L, 1L, 1L)),
      s"got ${ArcGisWriteStats.last("delnoop")}")
  }

  test("FAULT INJECTION: server loss between the delete probe and the " +
      "OID-window read — no tombstone lost or double-delivered on restart") {
    // The r16 tombstone specs cover the happy path and the wrong-mode
    // checkpoint; this stages the mid-batch crash in between: the batch's
    // deletedFeatures probe ANSWERS, then the live OID-window read dies.
    // The offsets for the batch are already in the WAL, the batch must not
    // commit, and the restarted query must replay the SAME window — the
    // successfully-probed tombstone is neither lost (it rides the replay)
    // nor doubled (the failed attempt committed nothing).
    import scala.jdk.CollectionConverters._
    val client = new EditableMock(
      (0L until 4L).map(i => editFeat(i, "active", 100L + i))) {
      @volatile var failLiveReads = false
      val delProbes = new java.util.concurrent.atomic.AtomicInteger(0)
      override def queryPage(offset: Long, count: Int, where: String,
          outFields: Seq[String], envelope: Option[Envelope],
          outSR: Option[String]): Seq[EsriFeature] = {
        if (failLiveReads)
          throw new RuntimeException("injected: feature service dropped mid-batch")
        super.queryPage(offset, count, where, outFields, envelope, outSR)
      }
      override def queryDeletedFeatures(loTs: Long, hiTs: Long): Seq[(Long, Long)] = {
        delProbes.incrementAndGet()
        super.queryDeletedFeatures(loTs, hiTs)
      }
    }
    ArcGisClientRegistry.register("streamfault", client)
    val ckpt = java.nio.file.Files.createTempDirectory("arcgis-fault-ckpt").toString
    // foreachBatch (checkpoint-recoverable, unlike the memory sink in
    // append mode) collecting only rows whose batch ACTION succeeded —
    // exactly what a transactional downstream sees
    val delivered = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Boolean)]()
    def start() = spark.readStream.format("arcgis").option("client", "streamfault")
      .option("incremental", "editDate").option("editDateField", "edited")
      .option("deletes", "true").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.select(col("objectid"), col("_deleted")).collect()
          .foreach(r => delivered.add((id, r.getLong(0), r.getBoolean(1))))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(50)).start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(delivered.asScala.map(_._2).sorted.toSeq == (0L until 4L),
        "backfill committed before the fault")
      // edit + delete land in one pending window; then the server "dies"
      // for live reads while the delete journal keeps answering
      client.upsert(1L, "updated", 500L)
      client.delete(2L, 501L)
      val probesAtArm = client.delProbes.get()
      delivered.clear()
      client.failLiveReads = true
      intercept[Exception](q1.processAllAvailable())
      assert(q1.exception.isDefined, "the query must fail, not hang")
      assert(client.delProbes.get() > probesAtArm,
        "the delete journal WAS probed during the failed batch")
      assert(delivered.isEmpty,
        "a failed batch must deliver nothing — no partial tombstones")
    } finally q1.stop()

    // server recovers; same checkpoint → the WAL replays the same window
    client.failLiveReads = false
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = delivered.asScala.map(r => (r._2, r._3)).toSeq
      assert(rows.count(_ == (2L, true)) == 1,
        s"exactly one tombstone for oid 2 after replay, got $rows")
      assert(rows.count(_ == (1L, false)) == 1,
        s"the edited row replays exactly once, got $rows")
      assert(!rows.exists(r => r._1 == 0L || r._1 == 3L),
        s"backfill must NOT re-deliver (offset resume), got $rows")
      // quiet trigger: nothing re-delivers
      val n = delivered.size()
      q2.processAllAvailable()
      assert(delivered.size() == n, "no double delivery on a quiet trigger")
    } finally q2.stop()
  }

  test("deletes=true without incremental=editDate fails fast") {
    val client = new EditableMock(Seq(editFeat(0L, "active", 1L)))
    ArcGisClientRegistry.register("streamdelbad", client)
    val e = intercept[IllegalArgumentException](new ArcGisMicroBatchStream(
      new org.apache.spark.sql.types.StructType(),
      Map("client" -> "streamdelbad", "deletes" -> "true"), "1=1"))
    assert(e.getMessage.contains("incremental=editDate"))
  }

  test("editDateLiteral=timestamp renders SQL-92 TIMESTAMP window bounds") {
    val client = new EditableMock(
      (0L until 3L).map(i => editFeat(i, "active", 1700000000000L + i * 1000)))
    ArcGisClientRegistry.register("streamtslit", client)
    val q = spark.readStream.format("arcgis").option("client", "streamtslit")
      .option("incremental", "editDate").option("editDateField", "edited")
      .option("editDateLiteral", "timestamp").load()
      .writeStream.format("memory").queryName("arcstreamts")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT objectid FROM arcstreamts").collect()
        .map(_.getLong(0)).sorted
      assert(got.toSeq == (0L until 3L),
        "rows must be delivered through the TIMESTAMP-literal where")
      // the wire-level where must carry SQL-92 literals, not raw numerics
      import scala.jdk.CollectionConverters._
      val wheres = client.whereLog.asScala.filter(_.contains("edited"))
      assert(wheres.nonEmpty)
      assert(wheres.forall(_.contains("TIMESTAMP '")),
        s"expected TIMESTAMP literals in: ${wheres.take(3)}")
      assert(!wheres.exists(_.matches(".*edited\\s*>\\s*\\d.*")),
        "no raw epoch numerics against the date field")
    } finally q.stop()
  }

  test("editLagMs defers the freshest edits until the watermark passes them") {
    val client = new EditableMock(
      (0L until 5L).map(i => editFeat(i, "active", 1000L + i)))
    ArcGisClientRegistry.register("streamlag", client)
    val q = spark.readStream.format("arcgis").option("client", "streamlag")
      .option("incremental", "editDate").option("editDateField", "edited")
      .option("editLagMs", "100").load()
      .writeStream.format("memory").queryName("arcstreamlag")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      // watermark = maxEdit(1004) − lag(100) = 904 < initial offset (999):
      // everything sits inside the lag window, nothing delivered yet —
      // protection against edits that commit with ts == probed max AFTER
      // the partition reads ran
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM arcstreamlag").count() == 0L)
      // a much later edit pushes the watermark past the originals; the new
      // edit itself (2000) stays deferred behind the lag (watermark 1900)
      client.upsert(5L, "new", 2000L)
      q.processAllAvailable()
      val got = spark.sql("SELECT objectid FROM arcstreamlag").collect()
        .map(_.getLong(0)).sorted
      assert(got.toSeq == (0L until 5L), s"originals delivered, fresh edit deferred: ${got.toSeq}")
    } finally q.stop()
  }
}
