package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hot text kernels as native Catalyst expressions. Bench showed Spark's
  * higher-order functions (`transform`/`aggregate` lambdas) evaluate
  * interpreted — shingle construction alone cost ~6 s/pass at sf0.1 — so
  * per SURVEY.md §7.3's promotion rule these run the whole token loop in
  * one compiled helper per row instead of per-element lambda dispatch.
  *
  * The arithmetic is bit-identical to the Column/SQL formulations in
  * [[TextOps]] (same token hash, same distinct-shingle sets), so the DuckDB
  * oracles are unchanged.
  */
object TextExpressions {

  /** Whitespace split matching `split(text, ' ')` (limit -1: keeps empty
    * tokens, including trailing).
    */
  private def splitTokens(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        out += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** [[TextOps.tokenHash]] twin on JVM strings. */
  private def tokenHash(t: String): Long = {
    // CODEPOINT semantics throughout, matching the Column spelling and
    // DuckDB: Spark's ascii() returns the first character's codepoint and
    // length() counts codepoints, while Java's charAt/length see UTF-16
    // units — on an astral (non-BMP) token like an emoji, charAt(0) is a
    // surrogate (55357) where ascii() reads 128512, and length disagrees
    // too. BMP input is identical either way (why the ASCII/é/日本 corpora
    // never caught it); the probe-verified divergence lives only here.
    val first = if (t.isEmpty) 0 else t.codePointAt(0)
    val last = if (t.isEmpty) 0 else t.codePointBefore(t.length)
    val cpLen = t.codePointCount(0, t.length).toLong
    (cpLen * 2654435761L + first * 131L + last) % TextOps.P
  }

  /** Distinct n-token shingles, first-occurrence order. */
  def shingleArrayEval(text: UTF8String, n: Int): ArrayData = {
    val toks = splitTokens(text.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** All MinHash permutations in one token loop: element p of the result is
    * min over tokens of (a_p*h(t)+b_p) mod P.
    */
  def minhashSigEval(text: UTF8String, abs: Array[Long]): ArrayData = {
    val toks = splitTokens(text.toString)
    val k = abs.length / 2
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash(toks(i))
      var p = 0
      while (p < k) {
        val v = (abs(2 * p) * h + abs(2 * p + 1)) % TextOps.P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var q = 0
    while (q < k) { out(q) = mins(q); q += 1 }
    new GenericArrayData(out)
  }

  /** Rolling k-gram fingerprints over a token array in ONE compiled loop:
    * per token h = [[tokenHash]], then element i (0-based gram start) is the
    * polynomial fold acc → (acc·FpB + h) mod FpM over h[i..i+k-1] — the
    * exact arithmetic of `TextOps.gramFingerprints` (the Column/HOF
    * spelling, kept as the auditable twin; `TextExpressionsSpec` pins
    * parity). Promoted to a kernel because the HOF spelling nests
    * `aggregate(slice(...))` inside `transform` — every step is an
    * interpreted lambda dispatch, which bench showed costing ~10 s/query at
    * sf0.1 (d31) where this loop is milliseconds. The fold re-multiplies
    * per gram (O(k)/gram, 10 mul-mods of plain longs) rather than sliding
    * in O(1)/gram: sliding needs (h_out·FpB^{k-1}) mod FpM, a 79-bit
    * product requiring 128-bit mulmod; 10 compiled mul-adds are already
    * ~ns/gram, far below the postings shuffle this feeds. Empty array when
    * the doc has < k tokens.
    */
  def gramFingerprintsEval(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(toks.getUTF8String(i).toString); i += 1 }
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * TextOps.FpB + hs(s + j)) % TextOps.FpM; j += 1 }
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Size of the intersection of two string arrays that are BOTH sorted
    * ascending (UTF8String binary order — what `array_sort` produces) and
    * distinct. One merge pass, no per-pair hash-set allocation; the caller
    * sorts each document's set once, so a pair join does O(|A|+|B|)
    * comparisons per pair instead of building a hash table per pair.
    */
  def sortedIntersectSizeEval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** [[sortedIntersectSizeEval]] twin for dictionary-encoded int sets
    * (sorted ascending, distinct) — int compares instead of UTF8String
    * compares in the merge loop.
    */
  def sortedIntersectSizeIntEval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** [[sortedIntersectSizeIntEval]] twin for long ids (the scalable
    * dictionary path assigns ids with monotonically_increasing_id, which
    * are longs).
    */
  def sortedIntersectSizeLongEval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Two-round 60-bit mix of a token hash — EVERY output bit must carry
    * the hash's full entropy or a banded fingerprint index grows a
    * degenerate band. One round (m = h·K mod 2^60, v = m xor (m >>> 30))
    * is NOT enough: v's bits 45-59 are m's own top bits ≈ (h >> 14), and
    * [[tokenHash]]'s high bits carry only the token-LENGTH term
    * (first·131 + last < 2^15 touches low bits), so the top 15-bit band of
    * d26's wide index collapsed to a token-length profile — measured at
    * the 50× corpus (r17): ONE band-3 bucket held 46k documents and the
    * candidate join produced 3.3B pairs for ~8k true hits. Round 2
    * re-multiplies the fully-mixed low 30 bits (v mod 2^30 =
    * m[0:29] xor m[30:59], a function of every bit of h — and tokenHash is
    * mod 1e9+7, so 30 bits already carry ALL its entropy); lo < 2^30 keeps
    * lo·K < 2^62, no signed-64 overflow on either engine. SQL twin:
    * `DedupPack.mix60StagedCtes`.
    */
  def mix60(h: Long): Long = {
    val m1 = (h * 2654435761L) & ((1L << 60) - 1)
    val v1 = m1 ^ (m1 >>> 30)
    val lo = v1 & ((1L << 30) - 1)
    val m2 = (lo * 2654435761L) & ((1L << 60) - 1)
    m2 ^ (m2 >>> 30)
  }

  /** 60-bit SimHash in one token loop (the Manku near-dup fingerprint,
    * sized to 60 bits so the value — and every band slice — stays a
    * non-negative BIGINT on both engines). Per token: h = [[tokenHash]],
    * v = [[mix60]](h) — then bit b of the result
    * is set iff more tokens have bit b of v set than clear (ties → clear).
    * SQL twin: per-bit signed votes over the same v, see d20's oracle.
    */
  def simHash60Eval(text: UTF8String): Long = {
    val toks = splitTokens(text.toString)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val v = mix60(tokenHash(toks(i)))
      var b = 0
      while (b < 60) {
        if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Seeded variant of [[simHash60Eval]]: the seed offsets the token hash
    * BEFORE the multiplicative mix, giving an independent 60-bit half for
    * wide (120-bit) fingerprints. Seed must stay small enough that
    * `(tokenHash + seed) * 2654435761` cannot overflow a signed long
    * (tokenHash < 1e9+7, so any seed < ~2e9 is safe) — overflow would
    * break parity with the oracle's non-overflowing `%` arithmetic.
    * SQL twin: [[mix60]] over `th(x) + seed` (`DedupPack.mix60StagedCtes`).
    */
  def simHash60SeededEval(text: UTF8String, seed: Long): Long = {
    val toks = splitTokens(text.toString)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val v = mix60(tokenHash(toks(i)) + seed)
      var b = 0
      while (b < 60) {
        if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** 8-bit SimHash over RAW tokenHash bits 0–7 (d6's definition — unlike
    * [[simHash60Eval]], which votes on bits of a multiplicative mix): one
    * compiled token loop per row replacing eight interpreted `aggregate`
    * lambda passes. Bit-identical to `TextOps.simhash8`
    * (`TextExpressionsSpec` pins the parity), so d6's oracle is unchanged.
    */
  def simHash8Eval(text: UTF8String): Long = {
    val toks = splitTokens(text.toString)
    val votes = new Array[Int](8)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash(toks(i))
      var b = 0
      while (b < 8) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 8) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  def shingles(text: Column, n: Int): Column =
    GraftShims.column(ShingleArray(GraftShims.expression(text), n))

  def simhash60(text: Column): Column =
    GraftShims.column(SimHash60(GraftShims.expression(text)))

  def simhash8(text: Column): Column =
    GraftShims.column(SimHash8(GraftShims.expression(text)))

  def simhash60Seeded(text: Column, seed: Long): Column =
    GraftShims.column(SimHash60Seeded(GraftShims.expression(text), seed))

  def minhashSignature(text: Column, seeds: Seq[(Long, Long)]): Column =
    GraftShims.column(
      MinHashSignature(GraftShims.expression(text), seeds.flatMap(p => Seq(p._1, p._2)).toArray)
    )

  def gramFingerprintsK(toks: Column, k: Int): Column =
    GraftShims.column(GramFingerprints(GraftShims.expression(toks), k))

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftShims.column(
      SortedIntersectSize(GraftShims.expression(a), GraftShims.expression(b))
    )

  def sortedIntersectSizeInt(a: Column, b: Column): Column =
    GraftShims.column(
      SortedIntersectSizeInt(GraftShims.expression(a), GraftShims.expression(b))
    )

  def sortedIntersectSizeLong(a: Column, b: Column): Column =
    GraftShims.column(
      SortedIntersectSizeLong(GraftShims.expression(a), GraftShims.expression(b))
    )
}

case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.shingleArrayEval(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.shingleArrayEval($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleArray = copy(child = c)
  override def prettyName: String = "shingle_array"
}

case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.simHash60Eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.simHash60Eval($c)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
  override def prettyName: String = "simhash60"
}

case class SimHash8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.simHash8Eval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.simHash8Eval($c)")
  override protected def withNewChildInternal(c: Expression): SimHash8 = copy(child = c)
  override def prettyName: String = "simhash8"
}

case class SimHash60Seeded(child: Expression, seed: Long) extends UnaryExpression {
  require(seed >= 0 && seed < 2000000000L,
    "seed must be in [0, 2e9) so the mix cannot overflow a signed long")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.simHash60SeededEval(v.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.simHash60SeededEval($c, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SimHash60Seeded = copy(child = c)
  override def prettyName: String = "simhash60_seeded"
}

case class GramFingerprints(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.gramFingerprintsEval(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.gramFingerprintsEval($c, $k)")
  override protected def withNewChildInternal(c: Expression): GramFingerprints = copy(child = c)
  override def prettyName: String = "gram_fingerprints"
}

case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.sortedIntersectSizeEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextExpressions.sortedIntersectSizeEval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_size"
}

case class SortedIntersectSizeInt(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.sortedIntersectSizeIntEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextExpressions.sortedIntersectSizeIntEval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSizeInt =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_size_int"
}

case class SortedIntersectSizeLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExpressions.sortedIntersectSizeLongEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextExpressions.sortedIntersectSizeLongEval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSizeLong =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_size_long"
}

case class MinHashSignature(child: Expression, abs: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    TextExpressions.minhashSigEval(v.asInstanceOf[UTF8String], abs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val absRef = ctx.addReferenceObj("mhAbs", abs, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExpressions.minhashSigEval($c, $absRef)")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}
