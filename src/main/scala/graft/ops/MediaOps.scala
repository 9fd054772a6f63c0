package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.9, driver mandate): image/audio/video
  * payloads ride as opaque `BinaryType` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample are batch operations
  * over those bytes.
  *
  * The codecs themselves are REAL — the format matrix as of round 12:
  *
  * | container | encode | decode | lossless | certified by |
  * |---|---|---|---|---|
  * | WAV/PCM s16le | `WavPack` | `WavMeta`/`PcmStats` | yes | m8/m9 byte-derived oracles |
  * | PNG (deflate + filters) | `PngEncodeGray` | `PngStats`/`PngAHash` | yes (8-bit gray) | m14/m15 hex-dump oracles |
  * | BMP (uncompressed palette) | `BmpEncodeGray` | `ImageStats` (magic-sniffing) | yes (8-bit gray) | m16 hex-dump + exact container length |
  * | GIF | — | `ImageStats` admits it (JDK decoder) | n/a | sniff path in MediaExpressionsSpec |
  *
  * All through the JDK's own `javax.imageio`/byte kernels in
  * [[graft.functions.MediaExpressions]] — zero external libs, and the
  * container-agnostic [[graft.functions.ImageStats]] dispatches on magic
  * bytes so a mixed corpus pays a few byte compares, not a decoder
  * exception, per non-image row. [[decodeStub]]/[[resizeStub]]
  * below are NOT the decode path — they are deterministic fakes that keep
  * the `mapPartitions` batch shape (one codec init per partition, tight
  * row loop — where a heavier JNI codec would sit) testable with stable
  * oracles (m3/m4); swapping them for any codec changes no plan shape.
  *
  * Scale: payload bytes stay columnar parquet binary; all ops are narrow
  * (per-row / per-partition). A 100 TB media corpus partitions by file
  * group; nothing here shuffles.
  */
object MediaOps {

  /** Media metadata struct: mime + dimensions + size, the typed face of an
    * opaque payload.
    */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width_px", IntegerType),
    StructField("height_px", IntegerType),
    StructField("size_bytes", LongType)
  ))

  /** Deterministic fake dimensions for the batch-shape tests (m3) — the
    * REAL image decode is [[graft.functions.MediaExpressions.pngStatsOf]]
    * (query m14). The signature (bytes in, dimensions out) is the contract
    * a heavier codec drops into this `mapPartitions` loop.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = if (bytes == null) 0 else bytes.length
    (16 + n % 64, 16 + (n / 64) % 64)
  }

  /** Pack a binary payload column with its typed metadata. */
  def packMedia(df: DataFrame, payload: Column, mime: String): DataFrame =
    df.withColumn("media_bytes", payload.cast(BinaryType))
      .withColumn(
        "media_meta",
        struct(
          lit(mime).as("mime"),
          (lit(16) + length(col("media_bytes")) % 64).as("width_px"),
          (lit(16) + (length(col("media_bytes")) / 64).cast("int") % 64).as("height_px"),
          length(col("media_bytes")).cast("long").as("size_bytes")
        )
      )

  /** Frame sampling: every `stride` bytes take a `frameLen`-byte window —
    * the video-frame-sample shape as pure substring expressions (1-based
    * offsets, codegen'd, no UDF).
    */
  def sampleFrames(bytesCol: Column, frameLen: Int, stride: Int, nFrames: Int): Column =
    array((0 until nFrames).map { i =>
      substring(bytesCol, 1 + i * stride, frameLen)
    }: _*)

  /** Deterministic fake for decode→scale→re-encode (batch-shape test m4):
    * keeps every `stride`-th byte. The signature (bytes in, bytes out,
    * metadata derived from the NEW payload) is the contract a real
    * image-resize kernel drops into; the real decode path is
    * [[graft.functions.MediaExpressions]]' PNG codec (m14).
    */
  def resizeStub(bytes: Array[Byte], stride: Int): Array[Byte] = {
    if (bytes == null) return Array.emptyByteArray
    val out = new Array[Byte]((bytes.length + stride - 1) / stride)
    var i = 0
    var j = 0
    while (i < bytes.length) { out(j) = bytes(i); i += stride; j += 1 }
    out
  }

  /** Batch resize via `mapPartitions` (same codec-per-partition shape as
    * [[featurize]]): emits the resized payload's metadata — size, stubbed
    * dimensions, and byte sum over the NEW payload.
    */
  def resize(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("resized_bytes_len", LongType),
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("byte_sum", LongType)
    ))
    val idIdx = df.schema.fieldIndex(idCol)
    val bytesIdx = df.schema.fieldIndex("media_bytes")
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      it.map { internal =>
        val id = internal.getLong(idIdx)
        val resized = resizeStub(internal.getBinary(bytesIdx), stride)
        val (w, h) = decodeStub(resized)
        var sum = 0L
        var i = 0
        while (i < resized.length) { sum += resized(i) & 0xff; i += 1 }
        org.apache.spark.sql.catalyst.InternalRow(id, resized.length.toLong, w, h, sum)
      }
    }
    org.apache.spark.sql.GraftShims.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Batch featurize via `mapPartitions` — the exact shape a real decoder
    * runs in (one codec init per partition, then a tight loop). Emits
    * (id, width, height, byte_sum) with the stub decode.
    */
  def featurize(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width_px", IntegerType),
      StructField("height_px", IntegerType),
      StructField("byte_sum", LongType)
    ))
    val idIdx = df.schema.fieldIndex(idCol)
    val bytesIdx = df.schema.fieldIndex("media_bytes")
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      // real impl: initialize the codec ONCE here, then stream the batch
      it.map { internal =>
        val id = internal.getLong(idIdx)
        val bytes = internal.getBinary(bytesIdx)
        val (w, h) = decodeStub(bytes)
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        org.apache.spark.sql.catalyst.InternalRow(id, w, h, sum)
      }
    }
    org.apache.spark.sql.GraftShims.internalCreateDataFrame(spark, rdd, schema)
  }
}
