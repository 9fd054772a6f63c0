package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL media codecs with zero external dependencies. Audio: the RIFF/WAVE
  * (PCM) container header, packed and parsed byte-exactly as Catalyst
  * expressions — [[WavPack]] builds the standard 44-byte PCM header in
  * front of a payload, [[WavMeta]] validates the four chunk markers and
  * reads the little-endian fields back. Image: genuine PNG via the JDK's
  * own `javax.imageio` (public, ships with every JRE — no external
  * library): [[PngEncodeGray]] renders a payload as an 8-bit grayscale
  * PNG through the real deflate/filter encoder, [[PngStats]] runs the real
  * PNG decoder and folds width/height/pixel statistics in one pass.
  * decode(pack(x)) == x is the oracle-checkable round trip (queries m8 and
  * m14), and both [[WavMeta]] and [[PngStats]] return null on bytes that
  * are not their container — the parse-don't-throw edge contract every
  * source in this engine follows.
  *
  * CodegenFallback is deliberate: header codec runs ONCE per media row over
  * 44 bytes — never inside a per-token or per-pair hot loop — so
  * interpreter dispatch is noise; the surrounding projections stay
  * codegen'd.
  */
object MediaExpressions {

  def wavPack(sampleRate: Column, channels: Column, bits: Column, payload: Column): Column =
    GraftShims.column(WavPack(
      GraftShims.expression(sampleRate), GraftShims.expression(channels),
      GraftShims.expression(bits), GraftShims.expression(payload)))

  def wavMeta(bytes: Column): Column =
    GraftShims.column(WavMeta(GraftShims.expression(bytes)))

  def pcmStats(bytes: Column): Column =
    GraftShims.column(PcmStats(GraftShims.expression(bytes)))

  def pcmFingerprint(bytes: Column, bins: Int): Column =
    GraftShims.column(PcmFingerprint(GraftShims.expression(bytes), bins))

  def frameSums(bytes: Column, frameLen: Int): Column =
    GraftShims.column(FrameSums(GraftShims.expression(bytes), frameLen))

  def pngEncodeGray(payload: Column, width: Int): Column =
    GraftShims.column(PngEncodeGray(GraftShims.expression(payload), width))

  def bmpEncodeGray(payload: Column, width: Int): Column =
    GraftShims.column(BmpEncodeGray(GraftShims.expression(payload), width))

  def pngStats(bytes: Column): Column =
    GraftShims.column(PngStats(GraftShims.expression(bytes)))

  def jpegEncodeGray(payload: Column, width: Int, quality: Float): Column =
    GraftShims.column(JpegEncodeGray(GraftShims.expression(payload), width, quality))

  def jpegPlaneError(jpeg: Column, payload: Column, width: Int): Column =
    GraftShims.column(
      JpegPlaneError(GraftShims.expression(jpeg), GraftShims.expression(payload), width))

  def imageStats(bytes: Column): Column =
    GraftShims.column(ImageStats(GraftShims.expression(bytes)))

  def pngAHash(bytes: Column): Column =
    GraftShims.column(PngAHash(GraftShims.expression(bytes)))

  def imageAHash(bytes: Column): Column =
    GraftShims.column(ImageAHash(GraftShims.expression(bytes)))

  /** Render a payload as a REAL 8-bit grayscale PNG via the JDK encoder:
    * pixel i (row-major at the given width) is unsigned byte i; the last
    * row zero-pads, and an empty payload still renders one all-zero row
    * (a PNG must have height >= 1). Deterministic pixel plane in, real
    * deflate-compressed PNG container out.
    */
  private[graft] def pngEncodeGrayBytes(payload: Array[Byte], width: Int): Array[Byte] = {
    val n = payload.length
    val h = math.max(1, (n + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < n) {
      raster.setSample(i % width, i / width, 0, payload(i) & 0xff)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    // MemoryCacheImageOutputStream: no ImageIO disk-cache temp file per row
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      if (!javax.imageio.ImageIO.write(img, "png", ios))
        throw new IllegalStateException("JDK PNG writer unavailable")
      ios.flush()
    } finally ios.close()
    baos.toByteArray
  }

  /** Render the same deterministic pixel plane as [[pngEncodeGrayBytes]]
    * into a REAL 8-bit BMP via the JDK encoder — the second container of
    * the format matrix (PNG: deflate + scanline filters; BMP: uncompressed
    * palette-indexed scanlines; both lossless for 8-bit gray, so decoded
    * stats from either container hash-match the same byte-derived oracle).
    */
  private[graft] def bmpEncodeGrayBytes(payload: Array[Byte], width: Int): Array[Byte] = {
    val n = payload.length
    val h = math.max(1, (n + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < n) {
      raster.setSample(i % width, i / width, 0, payload(i) & 0xff)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      if (!javax.imageio.ImageIO.write(img, "bmp", ios))
        throw new IllegalStateException("JDK BMP writer unavailable")
      ios.flush()
    } finally ios.close()
    baos.toByteArray
  }

  /** Render the same deterministic pixel plane as [[pngEncodeGrayBytes]]
    * into a REAL baseline JPEG via the JDK encoder at an EXPLICIT quality —
    * the third container of the format matrix and its first LOSSY one
    * (PNG: deflate; BMP: uncompressed; JPEG: 8×8 DCT + quantization). The
    * writer is pinned to `JPEG`/`MODE_EXPLICIT(quality)`, so the bytes are
    * a deterministic function of (payload, width, quality) on a given JDK —
    * which is all the engine needs: the oracle never re-encodes, it
    * certifies the DECODED plane against the source bytes through a
    * tolerance bucket (see query m17).
    */
  private[graft] def jpegEncodeGrayBytes(
      payload: Array[Byte], width: Int, quality: Float): Array[Byte] = {
    val n = payload.length
    val h = math.max(1, (n + width - 1) / width)
    val img = new java.awt.image.BufferedImage(
      width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < n) {
      raster.setSample(i % width, i / width, 0, payload(i) & 0xff)
      i += 1
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    if (!writers.hasNext) throw new IllegalStateException("JDK JPEG writer unavailable")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.flush()
    } finally {
      ios.close()
      writer.dispose()
    }
    baos.toByteArray
  }

  /** Decode a JPEG through the real JDK decoder and fold, in one pass, the
    * decoded geometry plus the per-pixel absolute error against the SOURCE
    * plane the payload renders (pixel i = unsigned byte i row-major, last
    * row zero-padded — exactly [[pngEncodeGrayBytes]]'s layout):
    * (width, height, n_pixels, max_abs_err, sum_abs_err). This is what a
    * lossy rung must measure — a PNG/BMP-style pixel_sum oracle would be
    * content-dependently off by the quantization noise, but geometry is
    * exact and the error folds into tolerance buckets the oracle can pin.
    * None when the bytes are not a JPEG (SOI sniff) or don't decode, or
    * when the decoded geometry disagrees with the payload's plane (that's
    * a codec fault, not an error magnitude).
    */
  private[graft] def jpegPlaneErrorOf(
      jpeg: Array[Byte], payload: Array[Byte],
      width: Int): Option[(Int, Int, Long, Long, Long)] = {
    if (jpeg == null || jpeg.length < 3) return None
    // SOI + first marker byte: FF D8 FF
    if ((jpeg(0) & 0xff) != 0xff || (jpeg(1) & 0xff) != 0xd8 ||
      (jpeg(2) & 0xff) != 0xff) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(jpeg)))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      val n = payload.length
      val expH = math.max(1, (n + width - 1) / width)
      if (w != width || h != expH) return None
      val raster = img.getRaster
      var maxErr = 0L
      var sumErr = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * width + x
          val src = if (i < n) payload(i) & 0xff else 0
          val dec = raster.getSample(x, y, 0)
          val e = math.abs(dec - src).toLong
          if (e > maxErr) maxErr = e
          sumErr += e
          x += 1
        }
        y += 1
      }
      Some((w, h, w.toLong * h, maxErr, sumErr))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Container sniff over the magic bytes: Some("png"|"bmp"|"gif"|"jpeg")
    * for the containers the bundled JDK ImageIO decodes, None otherwise. The
    * cheap rejection gate in front of every decode — at 100 TB the common
    * case in a mixed corpus is "not an image at all", and that must cost a
    * few byte compares, not a decoder exception.
    */
  private[graft] def imageSniff(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 8) return None
    var isPng = true
    var i = 0
    while (i < 8 && isPng) {
      if ((b(i) & 0xff) != PngSig(i)) isPng = false
      i += 1
    }
    if (isPng) Some("png")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff)
      Some("jpeg")
    else None
  }

  /** Band-0 pixel stats of any sniffable container ([[imageSniff]]),
    * decoded through the real JDK decoder — the container-agnostic twin of
    * [[pngStatsOf]] (identical fold; only the admission gate differs).
    */
  private[graft] def imageStatsOf(
      b: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
    if (imageSniff(b).isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) return None
      Some(rasterStats(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One pass over band 0: (width, height, n_pixels, sum, max, min). */
  private def rasterStats(
      img: java.awt.image.BufferedImage): (Int, Int, Long, Long, Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    var mx = Long.MinValue
    var mn = Long.MaxValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0).toLong
        sum += v
        if (v > mx) mx = v
        if (v < mn) mn = v
        x += 1
      }
      y += 1
    }
    (w, h, w.toLong * h, sum, mx, mn)
  }

  /** Average-hash (aHash) over a decoded PNG's band-0 pixel plane: pixel
    * (x, y) belongs to grid block (⌊8y/h⌋, ⌊8x/w⌋), and bit bi*8+bj
    * (LSB-first) is set when that block's mean exceeds the global mean —
    * compared cross-multiplied (blockSum·w·h > total·blockArea, with the
    * block area counted during the same scan so assignment and area can
    * never disagree on ragged grids), so the hash is pure integer math and
    * reproducible on any engine (the same trick as [[pcmFingerprintOf]]'s
    * envelope bits). Blocks empty at h<8 or w<8 have area 0 and never set
    * their bit. None when the bytes are not a decodable PNG.
    */
  private[graft] def pngAHashOf(b: Array[Byte]): Option[Long] = {
    if (b == null || b.length < 8) return None
    var i = 0
    while (i < 8) {
      if ((b(i) & 0xff) != PngSig(i)) return None
      i += 1
    }
    try {
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) return None
      Some(aHashOf(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The 8×8 grid-block mean-vs-global-mean fold of [[pngAHashOf]], shared
    * with the container-agnostic [[imageAHashOf]] so the two hashes are the
    * SAME integer function of the decoded plane — the property m18's
    * cross-codec stability certification rests on.
    */
  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var total = 0L
    val sums = new Array[Long](64)
    val areas = new Array[Long](64)
    var y = 0
    while (y < h) {
      val bi = y.toLong * 8 / h
      var x = 0
      while (x < w) {
        val bj = x.toLong * 8 / w
        val idx = (bi * 8 + bj).toInt
        val v = raster.getSample(x, y, 0).toLong
        total += v
        sums(idx) += v
        areas(idx) += 1
        x += 1
      }
      y += 1
    }
    val area = w.toLong * h
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) * area > total * areas(k)) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** [[pngAHashOf]] for ANY sniffable container ([[imageSniff]], which
    * includes lossy JPEG) — identical grid fold over the DECODED plane, so
    * hashes from different encodings of the same content are comparable.
    * None when the bytes are not a decodable image.
    */
  private[graft] def imageAHashOf(b: Array[Byte]): Option[Long] = {
    if (imageSniff(b).isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) return None
      Some(aHashOf(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode a PNG through the real JDK decoder and fold band-0 pixel stats:
    * (width, height, n_pixels, pixel_sum, pixel_max, pixel_min). None when
    * the bytes are not a PNG — signature sniff first (cheap rejection of
    * the common non-image case), then any decoder failure on a
    * signature-bearing-but-corrupt payload maps to None, never a thrown
    * task failure.
    */
  private[graft] def pngStatsOf(
      b: Array[Byte]): Option[(Int, Int, Long, Long, Long, Long)] = {
    if (b == null || b.length < 8) return None
    var i = 0
    while (i < 8) {
      if ((b(i) & 0xff) != PngSig(i)) return None
      i += 1
    }
    try {
      // MemoryCacheImageInputStream: decode from heap, no temp file; the
      // ImageInputStream overload closes the stream after reading
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) return None
      Some(rasterStats(img))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Unsigned-byte sums over consecutive `frameLen`-byte windows (the last
    * window may be short). One compiled pass; shared by [[FrameSums]].
    */
  private[graft] def frameSumsOf(b: Array[Byte], frameLen: Int): Array[Long] = {
    val n = b.length
    val nf = (n + frameLen - 1) / frameLen
    val out = new Array[Long](nf)
    var i = 0
    while (i < n) {
      out(i / frameLen) += (b(i) & 0xff).toLong
      i += 1
    }
    out
  }

  private def leInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte
    out(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def leShort(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte
    out(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def ascii(out: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
  }

  private[graft] def packBytes(
      sampleRate: Int, channels: Int, bits: Int, payload: Array[Byte]): Array[Byte] = {
    val dataSize = payload.length
    val out = new Array[Byte](44 + dataSize)
    ascii(out, 0, "RIFF")
    leInt(out, 4, 36 + dataSize)
    ascii(out, 8, "WAVE")
    ascii(out, 12, "fmt ")
    leInt(out, 16, 16) // PCM fmt chunk size
    leShort(out, 20, 1) // audioFormat = PCM
    leShort(out, 22, channels)
    leInt(out, 24, sampleRate)
    leInt(out, 28, sampleRate * channels * (bits / 8)) // byteRate
    leShort(out, 32, channels * (bits / 8)) // blockAlign
    leShort(out, 34, bits)
    ascii(out, 36, "data")
    leInt(out, 40, dataSize)
    System.arraycopy(payload, 0, out, 44, dataSize)
    out
  }

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def marker(b: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** null when the bytes are not a PCM WAV header. */
  private[graft] def metaOf(b: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    if (b == null || b.length < 44) return None
    if (!marker(b, 0, "RIFF") || !marker(b, 8, "WAVE") ||
      !marker(b, 12, "fmt ") || !marker(b, 36, "data")) return None
    val channels = u16le(b, 22)
    val sampleRate = u32le(b, 24).toInt
    val bits = u16le(b, 34)
    val dataSize = u32le(b, 40)
    val byteRate = u32le(b, 28)
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || byteRate <= 0) return None
    Some((sampleRate, channels, bits, dataSize, dataSize * 1000L / byteRate))
  }

  /** Signal statistics of a 16-bit PCM WAV's sample stream: the header is
    * parsed first (data length comes from the `data` chunk size, clamped to
    * the bytes actually present), then every little-endian signed 16-bit
    * sample is decoded in one loop. None for non-WAV or non-16-bit input;
    * a zero-sample track reports n=0 with null extrema/sum (matching SQL
    * aggregate-over-empty-list semantics).
    */
  private[graft] def pcmStatsOf(
      b: Array[Byte]): Option[(Long, Option[Long], Option[Long], Option[Long])] =
    metaOf(b) match {
      case Some((_, _, bits, dataSize, _)) if bits == 16 =>
        val avail = math.min(dataSize, (b.length - 44).toLong).toInt
        val n = avail / 2
        if (n == 0) Some((0L, None, None, None))
        else {
          var peak = Long.MinValue
          var vmin = Long.MaxValue
          var sabs = 0L
          var i = 0
          while (i < n) {
            val lo = b(44 + 2 * i) & 0xff
            val hi = b(44 + 2 * i + 1) // sign-extends: (hi << 8) | lo is the signed sample
            val v = ((hi << 8) | lo).toLong
            if (v > peak) peak = v
            if (v < vmin) vmin = v
            sabs += math.abs(v)
            i += 1
          }
          Some((n.toLong, Some(peak), Some(vmin), Some(sabs)))
        }
      case _ => None
    }

  /** Coarse energy-envelope fingerprint of a 16-bit PCM track: the sample
    * stream splits into `bins` contiguous windows on exact integer
    * boundaries (lo_k = ⌊k·n/bins⌋), and bit k is set when window k's
    * mean |sample| exceeds the track mean — compared cross-multiplied
    * (sum_k·n > total·len_k), so the fingerprint is pure integer math and
    * reproducible on any engine. None for non-WAV/non-16-bit input; an
    * empty track fingerprints to 0.
    */
  private[graft] def pcmFingerprintOf(b: Array[Byte], bins: Int): Option[Long] =
    metaOf(b) match {
      case Some((_, _, bits, dataSize, _)) if bits == 16 =>
        val avail = math.min(dataSize, (b.length - 44).toLong).toInt
        val n = avail / 2
        if (n == 0) Some(0L)
        else {
          val sums = new Array[Long](bins)
          var total = 0L
          var k = 0
          while (k < bins) {
            val lo = (k.toLong * n / bins).toInt
            val hi = ((k + 1).toLong * n / bins).toInt
            var i = lo
            var sb = 0L
            while (i < hi) {
              val v = ((b(44 + 2 * i + 1) << 8) | (b(44 + 2 * i) & 0xff)).toLong
              sb += math.abs(v)
              i += 1
            }
            sums(k) = sb
            total += sb
            k += 1
          }
          var fp = 0L
          k = 0
          while (k < bins) {
            val lo = (k.toLong * n / bins).toInt
            val hi = ((k + 1).toLong * n / bins).toInt
            if (sums(k) * n > total * (hi - lo)) fp |= (1L << k)
            k += 1
          }
          Some(fp)
        }
      case _ => None
    }
}

/** Per-frame unsigned-byte sums over a binary payload: frame k (0-based)
  * covers bytes [k·frameLen, (k+1)·frameLen); the last frame may be short.
  * The video-pipeline primitive under scene-change detection (m12):
  * consecutive-frame deltas over these sums segment a stream without the
  * payload ever leaving the scan. CodegenFallback per [[MediaExpressions]]'
  * contract — one pass per media row, never in a per-token loop.
  */
@ExpressionDescription(usage = "frame_sums(bytes, frameLen) - per-frame unsigned byte sums")
case class FrameSums(child: Expression, frameLen: Int)
    extends Expression with CodegenFallback {
  require(frameLen >= 1, s"frame_sums: frameLen must be >= 1, got $frameLen")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MediaExpressions.frameSumsOf(v.asInstanceOf[Array[Byte]], frameLen))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** 44-byte PCM RIFF header + payload → one binary column. */
@ExpressionDescription(usage = "wav_pack(sampleRate, channels, bits, payload) - PCM WAV bytes")
case class WavPack(sampleRate: Expression, channels: Expression, bits: Expression,
    payload: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(sampleRate, channels, bits, payload)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val sr = sampleRate.eval(input)
    val ch = channels.eval(input)
    val bt = bits.eval(input)
    val pl = payload.eval(input)
    if (sr == null || ch == null || bt == null || pl == null) null
    else MediaExpressions.packBytes(
      sr.asInstanceOf[Number].intValue(), ch.asInstanceOf[Number].intValue(),
      bt.asInstanceOf[Number].intValue(), pl.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sampleRate = c(0), channels = c(1), bits = c(2), payload = c(3))
}

/** Parse a PCM WAV header → struct(sample_rate, channels, bits, data_size,
  * duration_ms); null when the bytes are not a WAV.
  */
@ExpressionDescription(usage = "wav_meta(bytes) - PCM WAV header fields or null")
case class WavMeta(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("data_size", LongType),
    StructField("duration_ms", LongType)))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.metaOf(v.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some((sr, ch, bt, ds, ms)) =>
        new GenericInternalRow(Array[Any](sr, ch, bt, ds, ms))
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Decode a 16-bit PCM WAV's samples → struct(n_samples, peak, vmin,
  * sum_abs); null when the bytes are not a 16-bit PCM WAV. The per-sample
  * loop runs inside one compiled helper; CodegenFallback only costs the
  * per-ROW dispatch (WavMeta's contract).
  */
@ExpressionDescription(usage = "pcm_stats(bytes) - signed 16-bit PCM sample statistics")
case class PcmStats(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("peak", LongType),
    StructField("vmin", LongType),
    StructField("sum_abs", LongType)))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.pcmStatsOf(v.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some((n, peak, vmin, sabs)) =>
        new GenericInternalRow(Array[Any](n, peak.orNull, vmin.orNull, sabs.orNull))
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Coarse energy-envelope fingerprint (see
  * [[MediaExpressions.pcmFingerprintOf]]): `bins` mean-|sample| windows
  * binarized against the track mean, packed LSB-first into one long — the
  * locality-sensitive audio near-dup key (m11). Integer-exact, so two
  * engines computing it from the same samples agree bit-for-bit.
  */
@ExpressionDescription(usage = "pcm_fingerprint(bytes, bins) - energy-envelope bit fingerprint")
case class PcmFingerprint(child: Expression, bins: Int)
    extends Expression with CodegenFallback {
  // The fingerprint packs one bit per bin into a single Long: bins > 64
  // would silently wrap `1L << k` mod 64 (corrupted keys), bins < 1 would
  // blow up at eval with NegativeArraySizeException. Fail at plan time.
  require(bins >= 1 && bins <= 64,
    s"pcm_fingerprint: bins must be in [1, 64] (one bit per bin in a Long), got $bins")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.pcmFingerprintOf(v.asInstanceOf[Array[Byte]], bins).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Payload bytes → REAL 8-bit grayscale PNG (JDK `javax.imageio` encoder):
  * pixel i at row-major position, last row zero-padded, height >= 1. The
  * genuine deflate/filter pipeline runs per row — CodegenFallback per
  * [[MediaExpressions]]' codec contract (one encode per media row, never in
  * a per-token loop).
  */
@ExpressionDescription(usage = "png_encode_gray(payload, width) - grayscale PNG bytes")
case class PngEncodeGray(child: Expression, width: Int)
    extends Expression with CodegenFallback {
  require(width >= 1, s"png_encode_gray: width must be >= 1, got $width")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.pngEncodeGrayBytes(v.asInstanceOf[Array[Byte]], width)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Perceptual average-hash of a decoded PNG (see
  * [[MediaExpressions.pngAHashOf]]): 8×8 grid-block means binarized
  * against the global mean, packed LSB-first into one long — the
  * locality-sensitive image near-dup key (m15), integer-exact so both
  * engines agree bit-for-bit. Null when the bytes are not a decodable PNG.
  */
@ExpressionDescription(usage = "png_ahash(bytes) - 64-bit average-hash of the decoded image")
case class PngAHash(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.pngAHashOf(v.asInstanceOf[Array[Byte]]).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Container-agnostic twin of [[PngAHash]] (see
  * [[MediaExpressions.imageAHashOf]]): the SAME 8×8 grid fold over the
  * decoded plane of any sniffable container, including lossy JPEG — the
  * perceptual key that lets one near-dup index span encodings (m18).
  */
@ExpressionDescription(
  usage = "image_ahash(bytes) - 64-bit average-hash of any decodable image")
case class ImageAHash(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.imageAHashOf(v.asInstanceOf[Array[Byte]]).orNull
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Render the deterministic gray plane as a REAL 8-bit BMP via the JDK
  * encoder — [[PngEncodeGray]]'s container-matrix sibling (same plane,
  * uncompressed container, equally lossless for 8-bit gray).
  */
@ExpressionDescription(usage = "bmp_encode_gray(payload, width) - grayscale BMP bytes")
case class BmpEncodeGray(child: Expression, width: Int)
    extends Expression with CodegenFallback {
  require(width >= 1, s"bmp_encode_gray: width must be >= 1, got $width")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.bmpEncodeGrayBytes(v.asInstanceOf[Array[Byte]], width)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Container-agnostic image decode via the real JDK decoders → the same
  * stats struct as [[PngStats]]; admits any [[MediaExpressions.imageSniff]]
  * container (PNG/BMP/GIF), null otherwise.
  */
@ExpressionDescription(usage = "image_stats(bytes) - decoded image dimension + pixel stats or null")
case class ImageStats(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("width_px", IntegerType),
    StructField("height_px", IntegerType),
    StructField("n_pixels", LongType),
    StructField("pixel_sum", LongType),
    StructField("pixel_max", LongType),
    StructField("pixel_min", LongType)))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.imageStatsOf(v.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some((w, h, np, sum, mx, mn)) =>
        new GenericInternalRow(Array[Any](w, h, np, sum, mx, mn))
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Decode a PNG via the real JDK decoder → struct(width_px, height_px,
  * n_pixels, pixel_sum, pixel_max, pixel_min) over band 0; null when the
  * bytes are not a decodable PNG (signature sniff, then parse-don't-throw).
  */
/** Render a payload as a REAL baseline JPEG at an explicit quality (see
  * [[MediaExpressions.jpegEncodeGrayBytes]]) — the lossy container of the
  * format matrix (m17). Per-media-row, CodegenFallback like the other
  * codec expressions: the DCT dominates, dispatch is noise.
  */
@ExpressionDescription(
  usage = "jpeg_encode_gray(payload) - payload bytes as an 8-bit grayscale baseline JPEG")
case class JpegEncodeGray(child: Expression, width: Int, quality: Float)
    extends Expression with CodegenFallback {
  require(width >= 1, s"jpeg_encode_gray: width must be >= 1, got $width")
  require(quality > 0f && quality <= 1f,
    s"jpeg_encode_gray: quality must be in (0,1], got $quality")
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.jpegEncodeGrayBytes(v.asInstanceOf[Array[Byte]], width, quality)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}

/** Decoded-geometry + per-pixel-error fold of a JPEG against the source
  * plane its payload renders (see [[MediaExpressions.jpegPlaneErrorOf]]).
  * Null when the bytes are not a decodable JPEG or the decoded geometry
  * disagrees with the payload — the parse-don't-throw edge contract.
  */
@ExpressionDescription(
  usage = "jpeg_plane_error(jpeg, payload) - decoded geometry + abs error vs the source plane")
case class JpegPlaneError(left: Expression, right: Expression, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("width_px", IntegerType),
    StructField("height_px", IntegerType),
    StructField("n_pixels", LongType),
    StructField("max_abs_err", LongType),
    StructField("sum_abs_err", LongType)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(jpeg: Any, payload: Any): Any =
    MediaExpressions.jpegPlaneErrorOf(
      jpeg.asInstanceOf[Array[Byte]], payload.asInstanceOf[Array[Byte]], width) match {
      case None => null
      case Some((w, h, np, mx, sm)) => new GenericInternalRow(Array[Any](w, h, np, mx, sm))
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

@ExpressionDescription(usage = "png_stats(bytes) - decoded PNG dimension + pixel stats or null")
case class PngStats(child: Expression) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = StructType(Seq(
    StructField("width_px", IntegerType),
    StructField("height_px", IntegerType),
    StructField("n_pixels", LongType),
    StructField("pixel_sum", LongType),
    StructField("pixel_max", LongType),
    StructField("pixel_min", LongType)))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MediaExpressions.pngStatsOf(v.asInstanceOf[Array[Byte]]) match {
      case None => null
      case Some((w, h, np, sum, mx, mn)) =>
        new GenericInternalRow(Array[Any](w, h, np, sum, mx, mn))
    }
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
}
