package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaExpressions

/** Byte-exact tests for the WAV PCM header codec (the real, dependency-free
  * media codec path next to the documented image-decode stub).
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
}
