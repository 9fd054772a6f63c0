package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaExpressions

/** Byte-exact tests for the dependency-free media codecs: the WAV PCM
  * header pack/parse and the real JDK-ImageIO PNG encode/decode.
  */
class MediaExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("packBytes emits the canonical 44-byte PCM header, byte for byte") {
    val b = MediaExpressions.packBytes(44100, 2, 16, Array[Byte](1, 2, 3, 4))
    assert(b.length == 48)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") == "fmt ")
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    // chunkSize = 36 + 4 = 40 LE at offset 4
    assert(b(4) == 40 && b(5) == 0 && b(6) == 0 && b(7) == 0)
    // audioFormat=1, channels=2
    assert(b(20) == 1 && b(21) == 0 && b(22) == 2 && b(23) == 0)
    // sampleRate 44100 = 0xAC44 LE
    assert((b(24) & 0xff) == 0x44 && (b(25) & 0xff) == 0xac && b(26) == 0 && b(27) == 0)
    // byteRate = 44100*2*2 = 176400 = 0x02B110
    assert((b(28) & 0xff) == 0x10 && (b(29) & 0xff) == 0xb1 && (b(30) & 0xff) == 0x02)
    // blockAlign=4, bits=16
    assert(b(32) == 4 && b(34) == 16)
    // dataSize=4 LE at 40, payload appended
    assert(b(40) == 4 && b(44) == 1 && b(47) == 4)
  }

  test("metaOf inverts packBytes; rejects non-WAV and truncated input") {
    val b = MediaExpressions.packBytes(16000, 1, 16, Array.fill[Byte](320)(7))
    assert(MediaExpressions.metaOf(b).contains((16000, 1, 16, 320L, 10L))) // 320B/32000Bps = 10ms
    assert(MediaExpressions.metaOf("not a wav at all, just text padding!!!!!!!!!".getBytes).isEmpty)
    assert(MediaExpressions.metaOf(b.slice(0, 43)).isEmpty)
    assert(MediaExpressions.metaOf(null).isEmpty)
    // corrupt one marker byte → rejected
    val c = b.clone(); c(12) = 'X'.toByte
    assert(MediaExpressions.metaOf(c).isEmpty)
  }

  test("Column surface: round-trip in a DataFrame; malformed bytes → null struct") {
    import spark.implicits._
    import MediaExpressions.{wavMeta, wavPack}
    val df = Seq((1L, "hello"), (2L, "a longer pcm payload")).toDF("id", "txt")
      .select(col("id"),
        wavMeta(wavPack(lit(8000), lit(1), lit(16), encode(col("txt"), "UTF-8"))).as("m"),
        wavMeta(encode(col("txt"), "UTF-8")).as("bad"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getStruct(1).getInt(0) == 8000) // sample_rate
    assert(rows(0).getStruct(1).getLong(3) == 5L) // data_size = len("hello")
    assert(rows.forall(_.isNullAt(2)), "non-WAV bytes must parse to null")
  }

  test("pcmStatsOf: signed LE samples, odd trailing byte, clamp, rejects") {
    // samples: 1, -1, -32768, 32767 (little-endian), plus one dangling byte
    val payload = Array[Byte](
      0x01, 0x00, // 1
      0xff.toByte, 0xff.toByte, // -1
      0x00, 0x80.toByte, // -32768
      0xff.toByte, 0x7f, // 32767
      0x2a // odd trailing byte — ignored
    )
    val b = MediaExpressions.packBytes(8000, 1, 16, payload)
    assert(MediaExpressions.pcmStatsOf(b)
      .contains((4L, Some(32767L), Some(-32768L), Some(1L + 1L + 32768L + 32767L))))
    // data-chunk size beyond the actual bytes → clamped to what's present
    val truncated = b.slice(0, 44 + 4) // header claims 9 bytes, only 4 present
    assert(MediaExpressions.pcmStatsOf(truncated).contains((2L, Some(1L), Some(-1L), Some(2L))))
    // empty payload → n=0 with null extrema (SQL empty-list semantics)
    val empty = MediaExpressions.packBytes(8000, 1, 16, Array.emptyByteArray)
    assert(MediaExpressions.pcmStatsOf(empty).contains((0L, None, None, None)))
    // non-WAV and non-16-bit → None
    assert(MediaExpressions.pcmStatsOf("plain text, definitely not RIFF bytes".getBytes).isEmpty)
    assert(MediaExpressions.pcmStatsOf(
      MediaExpressions.packBytes(8000, 1, 8, payload)).isEmpty)
  }

  test("PcmStats column surface matches a Spark-side recomputation") {
    import spark.implicits._
    import MediaExpressions.{pcmStats, wavPack}
    val df = Seq((1L, "hello world"), (2L, "x"), (3L, "abcd"))
      .toDF("id", "txt")
      .select(col("id"), encode(col("txt"), "UTF-8").as("p"))
      // >=2 bytes: Spark's sequence(1,0) is DESCENDING [1,0], not empty —
      // the zero-sample case is covered by the eval-path test above
      .filter(length(col("p")) >= 2)
      .select(col("id"),
        pcmStats(wavPack(lit(8000), lit(1), lit(16), col("p"))).as("st"),
        // independent restatement with built-ins over the ASCII codes
        expr("transform(sequence(1, length(p) div 2), " +
          "k -> ascii(substring(CAST(p AS STRING), 2*k-1, 1)) + " +
          "256 * ascii(substring(CAST(p AS STRING), 2*k, 1)))").as("vs"))
    val bad = df.filter(
      col("st.n_samples") =!= size(col("vs")) ||
        col("st.peak") =!= array_max(col("vs")) ||
        col("st.vmin") =!= array_min(col("vs")) ||
        col("st.sum_abs") =!= aggregate(col("vs"), lit(0L), (s, x) => s + abs(x)))
    assert(bad.count() == 0)
  }

  test("pcmFingerprintOf: envelope bits, gain invariance, rejects") {
    def track(samples: Seq[Int]): Array[Byte] = {
      val payload = samples.flatMap(v =>
        Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
      MediaExpressions.packBytes(8000, 1, 16, payload)
    }
    // 8 samples, one per bin: loud bins = exactly those above the mean
    val quiet = Seq(10, 10, 500, 10, 500, 10, 10, 500)
    val fp = MediaExpressions.pcmFingerprintOf(track(quiet), 8)
    assert(fp.contains((1L << 2) | (1L << 4) | (1L << 7)))
    // uniform gain scaling preserves the fingerprint (cross-multiplied
    // comparison has no absolute threshold) — the near-dup property
    val loud = quiet.map(_ * 13)
    assert(MediaExpressions.pcmFingerprintOf(track(loud), 8) == fp)
    // n not divisible by bins: integer boundaries still partition exactly
    val odd = Seq(1, 1, 1, 1000, 1000, 1, 1, 1, 1, 1, 1)
    val fpOdd = MediaExpressions.pcmFingerprintOf(track(odd), 8)
    assert(fpOdd.isDefined && fpOdd.get != 0L)
    // empty track → 0; non-WAV → None
    assert(MediaExpressions.pcmFingerprintOf(
      MediaExpressions.packBytes(8000, 1, 16, Array.emptyByteArray), 8).contains(0L))
    assert(MediaExpressions.pcmFingerprintOf("not RIFF at all".getBytes, 8).isEmpty)
  }

  test("frameSumsOf: exact window sums, short last frame, unsigned bytes") {
    import MediaExpressions.frameSumsOf
    // 5 bytes, frameLen 2 -> frames [1+2, 3+4, 5]; 0x80 = 128 unsigned
    assert(frameSumsOf(Array[Byte](1, 2, 3, 4, 5), 2).toSeq == Seq(3L, 7L, 5L))
    assert(frameSumsOf(Array[Byte](-128, -1), 2).toSeq == Seq(383L)) // 128 + 255
    assert(frameSumsOf(Array.emptyByteArray, 4).toSeq == Seq.empty)
    // column surface: SQL registration coerces the BIGINT literal
    val r = spark.sql(
      "SELECT frame_sums(CAST('abcd' AS BINARY), CAST(2 AS BIGINT)) AS fs").head()
    assert(r.getSeq[Long](0) == Seq(('a' + 'b').toLong, ('c' + 'd').toLong))
    val bad = intercept[Exception] {
      spark.sql("SELECT frame_sums(CAST('x' AS BINARY), 0)").head()
    }
    assert(bad.getMessage.contains("frameLen must be >= 1"), bad.getMessage)
  }

  test("PcmFingerprint rejects bins outside [1, 64] at construction") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val b = Literal(Array[Byte](1, 2, 3))
    for (bad <- Seq(0, -3, 65, 128)) {
      val e = intercept[IllegalArgumentException] {
        graft.functions.PcmFingerprint(b, bad)
      }
      assert(e.getMessage.contains("bins must be in [1, 64]"), e.getMessage)
    }
    // boundary values construct fine
    graft.functions.PcmFingerprint(b, 1)
    graft.functions.PcmFingerprint(b, 64)
  }

  test("pngEncodeGrayBytes -> pngStatsOf: real codec loop inverts the pixel plane") {
    // 5 bytes at width 4 -> 4x2 image, 3 padding zeros
    val payload = Array[Byte](10, 200.toByte, 0, 37, 255.toByte)
    val png = MediaExpressions.pngEncodeGrayBytes(payload, 4)
    // genuine PNG container: signature + IHDR
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(new String(png.slice(12, 16), "US-ASCII") === "IHDR")
    val Some((w, h, np, sum, mx, mn)) = MediaExpressions.pngStatsOf(png)
    assert((w, h, np) === ((4, 2, 8L)))
    assert(sum === 10L + 200L + 0L + 37L + 255L)
    assert(mx === 255L && mn === 0L)
    // pixel-exact beyond stats: decode again and check each sample
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val expect = payload.map(_ & 0xff) ++ Seq(0, 0, 0)
    for (i <- 0 until 8)
      assert(img.getRaster.getSample(i % 4, i / 4, 0) === expect(i), s"pixel $i")
  }

  test("pngEncodeGrayBytes: empty payload renders one all-zero row") {
    val png = MediaExpressions.pngEncodeGrayBytes(Array.emptyByteArray, 16)
    assert(MediaExpressions.pngStatsOf(png) === Some((16, 1, 16L, 0L, 0L, 0L)))
  }

  test("pngAHashOf: hand-computed block bits on a 4x2 plane; dup planes agree; rejects") {
    // pixels [[10,200,0,37],[255,0,0,0]]: with w=4,h=2 every pixel is its
    // own grid block — row 0 -> block row 0, row 1 -> block row 4; col x ->
    // block col 2x. total=502 over area 8, so bit set iff v*8 > 502*1, i.e.
    // v in {200, 255}: indices 0*8+2=2 and 4*8+0=32.
    val payload = Array[Byte](10, 200.toByte, 0, 37, 255.toByte, 0, 0, 0)
    val png = MediaExpressions.pngEncodeGrayBytes(payload, 4)
    assert(MediaExpressions.pngAHashOf(png) === Some((1L << 2) | (1L << 32)))
    // identical pixel planes hash identically even via separate encodes
    val png2 = MediaExpressions.pngEncodeGrayBytes(payload.clone(), 4)
    assert(MediaExpressions.pngAHashOf(png2) === MediaExpressions.pngAHashOf(png))
    // constant plane: no block exceeds the global mean -> hash 0
    val flat = MediaExpressions.pngEncodeGrayBytes(Array.fill[Byte](64)(100.toByte), 8)
    assert(MediaExpressions.pngAHashOf(flat) === Some(0L))
    // malformed
    assert(MediaExpressions.pngAHashOf(null) === None)
    assert(MediaExpressions.pngAHashOf("nope".getBytes("UTF-8")) === None)
    assert(MediaExpressions.pngAHashOf(png.take(16)) === None)
  }

  test("pngStatsOf rejects malformed bytes: no signature, truncated, corrupt body") {
    assert(MediaExpressions.pngStatsOf(null) === None)
    assert(MediaExpressions.pngStatsOf("not a png at all".getBytes("UTF-8")) === None)
    assert(MediaExpressions.pngStatsOf(Array[Byte](0x89.toByte, 'P', 'N')) === None)
    val good = MediaExpressions.pngEncodeGrayBytes(Array[Byte](1, 2, 3), 2)
    // signature present but body truncated mid-chunk -> decoder failure -> None
    assert(MediaExpressions.pngStatsOf(good.take(20)) === None)
    // signature followed by garbage -> None, never a throw
    assert(MediaExpressions.pngStatsOf(
      good.take(8) ++ Array.fill[Byte](32)(0x7f)) === None)
  }

  test("PngStats column surface: round trip in a DataFrame; non-PNG -> null struct") {
    import graft.functions.MediaExpressions.{pngEncodeGray, pngStats}
    import spark.implicits._
    val df = Seq((1L, "hello png"), (2L, "")).toDF("id", "txt")
      .select(col("id"), pngStats(pngEncodeGray(encode(col("txt"), "UTF-8"), 8)).as("st"))
      .orderBy("id")
    val rows = df.select("id", "st.width_px", "st.height_px", "st.pixel_sum").collect()
    assert(rows(0).getInt(1) === 8)
    assert(rows(0).getInt(2) === 2) // 9 bytes at width 8 -> 2 rows
    assert(rows(0).getLong(3) === "hello png".getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum)
    assert(rows(1).getInt(2) === 1) // empty -> one all-zero row
    val nulls = Seq((1L, "plain text")).toDF("id", "txt")
      .select(pngStats(encode(col("txt"), "UTF-8")).as("st"))
      .filter(col("st").isNull)
    assert(nulls.count() === 1)
    // width guard fails at construction, like the other codec expressions
    val e = intercept[IllegalArgumentException] {
      graft.functions.PngEncodeGray(
        org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1)), 0)
    }
    assert(e.getMessage.contains("width must be >= 1"))
  }

  test("format matrix: PNG and BMP encode the same plane, sniffing decoder agrees exactly") {
    val payload = (0 until 37).map(i => (i * 7 + 200).toByte).toArray
    val png = MediaExpressions.pngEncodeGrayBytes(payload, 16)
    val bmp = MediaExpressions.bmpEncodeGrayBytes(payload, 16)
    // different real containers...
    assert(MediaExpressions.imageSniff(png) === Some("png"))
    assert(MediaExpressions.imageSniff(bmp) === Some("bmp"))
    assert(!png.sameElements(bmp))
    // ...same decoded pixel plane, through the container-agnostic decoder
    val sPng = MediaExpressions.imageStatsOf(png)
    val sBmp = MediaExpressions.imageStatsOf(bmp)
    assert(sPng.isDefined && sPng === sBmp)
    // and the agnostic decoder matches the PNG-only one on PNG input
    assert(sPng === MediaExpressions.pngStatsOf(png))
    // BMP fixed layout: 14B header + 40B info + 1024B palette + 16B/row
    assert(bmp.length === 1078 + 16 * 3)
  }

  test("imageSniff rejects non-image bytes cheaply; imageStatsOf never throws") {
    assert(MediaExpressions.imageSniff("plain text bytes".getBytes("UTF-8")) === None)
    assert(MediaExpressions.imageSniff(Array[Byte](1, 2, 3)) === None)
    assert(MediaExpressions.imageSniff(null) === None)
    // sniffable magic but corrupt body -> None, never a task failure
    val fakeBmp = "BM".getBytes("UTF-8") ++ Array.fill[Byte](32)(0x11)
    assert(MediaExpressions.imageSniff(fakeBmp) === Some("bmp"))
    assert(MediaExpressions.imageStatsOf(fakeBmp) === None)
  }

  test("BmpEncodeGray/ImageStats column surface: BMP round trip; empty payload; width guard") {
    import graft.functions.MediaExpressions.{bmpEncodeGray, imageStats}
    import spark.implicits._
    val rows = Seq((1L, "hello bmp"), (2L, "")).toDF("id", "txt")
      .select(col("id"),
        imageStats(bmpEncodeGray(encode(col("txt"), "UTF-8"), 8)).as("st"))
      .orderBy("id")
      .select("id", "st.width_px", "st.height_px", "st.pixel_sum").collect()
    assert(rows(0).getInt(1) === 8)
    assert(rows(0).getInt(2) === 2)
    assert(rows(0).getLong(3) === "hello bmp".getBytes("UTF-8").map(_ & 0xff).map(_.toLong).sum)
    assert(rows(1).getInt(2) === 1) // empty -> one all-zero row
    val e = intercept[IllegalArgumentException] {
      graft.functions.BmpEncodeGray(
        org.apache.spark.sql.catalyst.expressions.Literal(Array[Byte](1)), 0)
    }
    assert(e.getMessage.contains("width must be >= 1"))
  }

  test("jpegEncodeGrayBytes -> jpegPlaneErrorOf: real lossy codec, geometry exact") {
    // genuine JPEG container: SOI marker, then a decodable stream
    val payload = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val jpg = MediaExpressions.jpegEncodeGrayBytes(payload, 16, 0.95f)
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8)
    val Some((w, h, np, mx, sm)) = MediaExpressions.jpegPlaneErrorOf(jpg, payload, 16)
    // 44 bytes at width 16 -> 16x3 plane
    assert((w, h, np) === ((16, 3, 48L)))
    // lossy but bounded: this plain-ASCII plane sits far inside m17's buckets
    assert(mx <= 48L, s"max_abs_err $mx")
    assert(sm <= 6L * np, s"sum_abs_err $sm over $np px")
    // determinism: the encoder is a pure function of (payload, width, quality)
    assert(java.util.Arrays.equals(jpg, MediaExpressions.jpegEncodeGrayBytes(payload, 16, 0.95f)))
    // empty payload renders one all-zero row, error 0 (flat plane survives DCT)
    val empty = MediaExpressions.jpegEncodeGrayBytes(Array.emptyByteArray, 16, 0.95f)
    assert(MediaExpressions.jpegPlaneErrorOf(empty, Array.emptyByteArray, 16)
      === Some((16, 1, 16L, 0L, 0L)))
    // rejects: not a JPEG, truncated body, geometry mismatch (wrong payload len)
    assert(MediaExpressions.jpegPlaneErrorOf(payload, payload, 16).isEmpty)
    assert(MediaExpressions.jpegPlaneErrorOf(jpg.slice(0, 20), payload, 16).isEmpty)
    assert(MediaExpressions.jpegPlaneErrorOf(jpg, new Array[Byte](400), 16).isEmpty)
  }

  test("m17 tolerance buckets hold with >=2x headroom on the sf0.001 corpus + UTF-8 stress") {
    // The oracle pins TRUE for max|err|<=48 and mean|err|<=6; this test is
    // the measurement behind the ">=2x headroom" claim — it fails if the
    // corpus-wide worst case ever exceeds HALF the bucket, i.e. before the
    // oracle itself is at risk. Multi-byte UTF-8 rows (0xC3/0xE2/0xF0 lead
    // bytes next to ASCII) are appended because they produce the sharpest
    // plane edges the text corpus can yield.
    import graft.functions.MediaExpressions.{jpegEncodeGray, jpegPlaneError}
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("text"))
      .union(Seq("é日本語😀 mixed ASCII and 汉字 stress ¡¿ßÿ", "😀😀😀😀",
        "ÿþý plain", "").toDF("text"))
    val payload = encode(col("text"), "UTF-8")
    val agg = docs
      .select(jpegPlaneError(jpegEncodeGray(payload, 16, 0.95f), payload, 16).as("e"))
      .agg(
        count(lit(1)).as("n"),
        count(col("e")).as("n_decoded"),
        max(col("e.max_abs_err")).as("worst_max"),
        max(col("e.sum_abs_err") / col("e.n_pixels").cast("double")).as("worst_mean"))
      .head()
    assert(agg.getLong(0) === agg.getLong(1), "some plane failed to decode")
    val worstMax = agg.getLong(2)
    val worstMean = agg.getDouble(3)
    info(s"measured worst max_abs_err=$worstMax worst mean=$worstMean")
    assert(worstMax <= 24L, s"m17 max bucket headroom eroded: $worstMax > 24")
    assert(worstMean <= 3.0, s"m17 mean bucket headroom eroded: $worstMean > 3.0")
  }

  test("m18 cross-codec aHash Hamming holds with >=2x headroom; identity on lossless") {
    // the m18 oracle pins hamming(aHash(png), aHash(jpeg)) <= 12; this is
    // the measurement behind that bucket — fail at HALF the bucket, before
    // the oracle is at risk. Also pins the lossless identity: PNG and BMP
    // decode to the SAME plane, so their aHashes must be EQUAL (hamming 0)
    // — the cross-codec drift is entirely the lossy rung's.
    import graft.functions.MediaExpressions.{
      bmpEncodeGray, imageAHash, jpegEncodeGray, pngAHash, pngEncodeGray}
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select(col("text"))
      .union(Seq("é日本語😀 mixed ASCII and 汉字 stress ¡¿ßÿ", "😀😀😀😀",
        "ÿþý plain", "").toDF("text"))
    val payload = encode(col("text"), "UTF-8")
    val h = docs.select(
      pngAHash(pngEncodeGray(payload, 16)).as("h_png"),
      imageAHash(bmpEncodeGray(payload, 16)).as("h_bmp"),
      imageAHash(jpegEncodeGray(payload, 16, 0.95f)).as("h_jpg"))
    val agg = h.agg(
      count(lit(1)).as("n"),
      count(col("h_jpg")).as("n_dec"),
      max(bit_count(col("h_png").bitwiseXOR(col("h_bmp")))).as("worst_lossless"),
      max(bit_count(col("h_png").bitwiseXOR(col("h_jpg")))).as("worst_lossy")).head()
    assert(agg.getLong(0) === agg.getLong(1), "some JPEG failed to decode")
    info(s"worst hamming: lossless=${agg.getInt(2)} lossy=${agg.getInt(3)}")
    assert(agg.getInt(2) === 0, "PNG and BMP decode the same plane; aHash must agree")
    assert(agg.getInt(3) <= 6, s"m18 bucket headroom eroded: ${agg.getInt(3)} > 6")
  }
}
