package graft

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.arcgis._

/** `attachments=true` scan (VERDICT r17 item 7): the public REST surface's
  * `{layer}/{oid}/attachments` listing + download endpoints exposed as a
  * DSv2 read, one row per attachment with the payload as BinaryType — the
  * bridge from the ArcGIS source to the m-family multimodal operators
  * (remote image → perceptual-hash dedup in ONE plan).
  *
  * Two layers of proof:
  *   1. wire-level — a loopback JDK HttpServer plays the attachments REST
  *      surface and the full DSv2 path runs over real java.net.http:
  *      OID-range listing, metadata parse, binary download (byte-exact,
  *      no JSON envelope), ARCGIS_PARAMS on the download URL, and the
  *      load-bearing pruning contract: a projection without `data` issues
  *      ZERO download requests;
  *   2. composed — a MockArcGisClient serves PNG/JPEG fixture payloads and
  *      one plan scans attachments and groups them by `imageAHash`,
  *      finding exactly the planted cross-feature duplicate.
  */
class ArcGisAttachmentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ------------------------------------------------------------ wire level
  test("attachments scan runs the REST surface over real HTTP with pruning") {
    val payloads: Map[(Long, Long), Array[Byte]] = Map(
      (1L, 1L) -> Array[Byte](0x50, 0x4e, 0x47, 0x00, -1, 0x7f, 0x10),
      (1L, 2L) -> Array[Byte](-1, -40, -1, -32, 0x00, 0x01),
      (3L, 7L) -> Array.tabulate(64)(i => (i * 7 % 251).toByte))
    val downloads = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val downloadParams = new java.util.concurrent.ConcurrentLinkedQueue[String]()

    def params(ex: HttpExchange): Map[String, String] = {
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      raw.split("&").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
      }.toMap
    }
    def reply(ex: HttpExchange, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    val oids = Seq(1L, 2L, 3L)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/alayer", (ex: HttpExchange) => {
      val p = params(ex)
      val path = ex.getRequestURI.getPath
      val att = "/alayer/(\\d+)/attachments$".r.findFirstMatchIn(path)
      val dl = "/alayer/(\\d+)/attachments/(\\d+)$".r.findFirstMatchIn(path)
      if (dl.isDefined) {
        val key = (dl.get.group(1).toLong, dl.get.group(2).toLong)
        downloads.add(s"${key._1}/${key._2}")
        downloadParams.add(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
        val bytes = payloads.getOrElse(key, Array.emptyByteArray)
        ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      } else if (att.isDefined) {
        val oid = att.get.group(1).toLong
        val infos = payloads.collect { case ((o, id), bytes) if o == oid =>
          s"""{"id":$id,"name":"att-$o-$id.bin","contentType":"application/octet-stream","size":${bytes.length}}"""
        }
        reply(ex, infos.mkString("""{"attachmentInfos":[""", ",", "]}"))
      } else path match {
        case "/alayer" =>
          reply(ex,
            """{"fields":[{"name":"objectid","type":"esriFieldTypeOID"},
              |{"name":"name","type":"esriFieldTypeString"}],
              |"maxRecordCount":10}""".stripMargin.replace("\n", ""))
        case "/alayer/query" if p.get("returnCountOnly").contains("true") =>
          reply(ex, s"""{"count":${oids.size}}""")
        case "/alayer/query" if p.contains("outStatistics") =>
          reply(ex, s"""{"features":[{"attributes":{"__lo":${oids.min},"__hi":${oids.max}}}]}""")
        case "/alayer/query" =>
          val where = p.getOrElse("where", "1=1")
          val lo = "objectid >= (\\d+)".r.findFirstMatchIn(where).map(_.group(1).toLong).getOrElse(Long.MinValue)
          val hi = "objectid < (\\d+)".r.findFirstMatchIn(where).map(_.group(1).toLong).getOrElse(Long.MaxValue)
          val feats = oids.filter(o => o >= lo && o < hi)
            .map(o => s"""{"attributes":{"objectid":$o}}""")
          reply(ex, feats.mkString("""{"features":[""", ",", "]}"))
        case other => reply(ex, s"""{"error":"unexpected path $other"}""")
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/alayer"
      ArcGisClientRegistry.register("attach-http",
        new HttpArcGisClient(base, extraParams = Seq("gdbVersion" -> "v1")))
      val df = spark.read.format("arcgis")
        .option("client", "attach-http")
        .option("attachments", "true")
        .load()

      // 1. metadata-only projection: full listing, ZERO downloads
      val meta = df.select("objectid", "attachment_id", "name", "size").collect()
      assert(meta.length == payloads.size)
      assert(downloads.isEmpty,
        s"metadata-only projection must not download payloads, saw $downloads")

      // 2. payload projection: byte-exact binary round-trip, no JSON mangling
      val rows = df.select("objectid", "attachment_id", "content_type", "data").collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Array[Byte]](3)).toMap
      assert(got.keySet == payloads.keySet)
      payloads.foreach { case (k, expected) =>
        assert(java.util.Arrays.equals(got(k), expected), s"payload bytes differ for $k")
      }
      assert(rows.forall(_.getString(2) == "application/octet-stream"))
      // ARCGIS_PARAMS merge rides the download URL too
      assert(downloadParams.asIterator().hasNext &&
        downloadParams.peek().contains("gdbVersion=v1"))
    } finally server.stop(0)
  }

  private implicit class QueueOps[T](q: java.util.concurrent.ConcurrentLinkedQueue[T]) {
    def asIterator(): java.util.Iterator[T] = q.iterator()
  }

  // --------------------------------------------------- saturation halving
  test("attachments OID listing halves saturated ranges (no silent truncation)") {
    // a layer whose maxRecordCount (mock pageSize) is far below the OID
    // range width: the reader's range listing saturates and must split
    // recursively — a reader that trusted the capped response would
    // silently drop every attachment past the server cap
    val fields = Seq(ArcGisField("objectid", "esriFieldTypeOID"))
    val rows = (1L to 57L).map(i => EsriFeature(Map("objectid" -> i), None))
    val mock = new MockArcGisClient(fields, rows, pageSize = 5)
    (1L to 57L).foreach { i =>
      mock.attachmentStore.put(i,
        Seq((AttachmentInfo(1, s"a$i", "application/octet-stream", 4),
          Array[Byte](i.toByte, 0, -1, 0x7f))))
    }
    ArcGisClientRegistry.register("attach-halving", mock)
    val df = spark.read.format("arcgis")
      .option("client", "attach-halving")
      .option("attachments", "true")
      .load()
    val got = df.select("objectid", "attachment_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1L to 57L).map(i => (i, 1L)).toSet,
      s"halving lost attachments: got ${got.size} of 57")
    // every listing request was for a sub-range small enough to be provably
    // complete: no satisfied response carried >= pageSize rows
    assert(mock.attachmentLog.toArray.length >= 57)
  }

  // ------------------------------------------------------- streaming guard
  test("readStream on attachments=true fails with guidance, not an opaque error") {
    val fields = Seq(ArcGisField("objectid", "esriFieldTypeOID"))
    val rows = Seq(EsriFeature(Map("objectid" -> 1L), None))
    ArcGisClientRegistry.register("attach-stream-guard", new MockArcGisClient(fields, rows))
    val ex = intercept[Exception] {
      spark.readStream.format("arcgis")
        .option("client", "attach-stream-guard")
        .option("attachments", "true")
        .load()
        .writeStream.format("memory").queryName("ag_guard").start()
        .processAllAvailable()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("batch-only")),
      s"expected the batch-only guidance, got: ${messages(ex)}")
  }

  // ------------------------------------------------------------- composed
  test("attachments -> imageAHash dedup composes in one plan (mock server)") {
    import graft.functions.MediaExpressions
    // fixture planes: PNG-encode three distinct text payloads via the real
    // codec expressions; plane A is planted on TWO different features (the
    // cross-feature duplicate the dedup must find), B and C are unique
    // payloads must be long and structurally distinct: a 64-bit average
    // hash over a 16-wide gray plane needs real brightness structure to
    // separate planes (short near-uniform text collides every hash)
    val tA = (0 until 256).map(i => if ((i / 16) % 2 == 0) 'z' else ' ').mkString
    val tB = (0 until 256).map(i => if (i % 3 == 0) '~' else '!').mkString
    val tC = (0 until 256).map(i => ('a' + (i * 31 % 26)).toChar).mkString
    val enc = spark.range(1).select(
      MediaExpressions.pngEncodeGray(encode(lit(tA), "UTF-8"), 16).as("a"),
      MediaExpressions.pngEncodeGray(encode(lit(tB), "UTF-8"), 16).as("b"),
      MediaExpressions.jpegEncodeGray(encode(lit(tC), "UTF-8"), 16, 0.95f).as("c"))
      .head()
    val (pa, pb, pc) = (enc.getAs[Array[Byte]]("a"), enc.getAs[Array[Byte]]("b"), enc.getAs[Array[Byte]]("c"))

    val fields = Seq(ArcGisField("objectid", "esriFieldTypeOID"),
      ArcGisField("status", "esriFieldTypeString"))
    val rows = (1L to 4L).map(i => EsriFeature(
      Map("objectid" -> i, "status" -> (if (i == 4L) "retired" else "active")), None))
    val mock = new MockArcGisClient(fields, rows)
    def info(id: Long, n: Int) = AttachmentInfo(id, s"p$id.png", "image/png", n)
    mock.attachmentStore.put(1L, Seq((info(1, pa.length), pa)))
    mock.attachmentStore.put(2L, Seq((info(1, pa.length), pa), (info(2, pb.length), pb)))
    mock.attachmentStore.put(3L, Seq((info(1, pc.length), pc)))
    // feature 4 has an attachment but is excluded by the user where below
    mock.attachmentStore.put(4L, Seq((info(1, pb.length), pb)))
    ArcGisClientRegistry.register("attach-mock", mock)

    val df = spark.read.format("arcgis")
      .option("client", "attach-mock")
      .option("attachments", "true")
      .option("where", "status = 'active'")
      .load()

    // ONE plan: remote attachment scan -> perceptual hash -> duplicate groups
    val dups = df
      .select(col("objectid"), col("attachment_id"),
        MediaExpressions.imageAHash(col("data")).as("h"))
      .groupBy(col("h"))
      .agg(collect_set(struct(col("objectid"), col("attachment_id"))).as("members"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect()

    assert(dups.length == 1, s"expected exactly one duplicate group, got ${dups.toSeq}")
    val members = dups(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(members == Set((1L, 1L), (2L, 1L)),
      s"duplicate group should be plane A on features 1 and 2, got $members")
    // the where-excluded feature contributed nothing
    assert(!mock.attachmentLog.toArray.exists { case (oid, _) => oid == 4L case _ => false },
      "feature 4 is excluded by the user where; its attachments must not be touched")
  }
}
