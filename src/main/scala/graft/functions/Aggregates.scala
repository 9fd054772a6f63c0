package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Custom aggregates (SURVEY.md §2.10) via the public `Aggregator` API —
  * the idiomatic Spark extension point for stateful aggregation; registered
  * through `functions.udaf` so it composes with groupBy/window like any
  * built-in and gets map-side partial aggregation for free.
  */
object Aggregates {

  final case class TermCount(term: String, n: Long)

  /** Exact per-group top-k heavy hitters over token arrays.
    *
    * reduce/merge accumulate a term→count map (Spark runs these map-side,
    * so the shuffle carries ONE buffer per group per mapper, not one row
    * per token occurrence — at 100 TB that is the difference between
    * shuffling buffers and shuffling the corpus); finish sorts by
    * (count desc, term asc) and truncates to k, making the result
    * deterministic and oracle-comparable.
    *
    * This is the exact form of the SpaceSaving/Misra-Gries sketch: the
    * buffer is unbounded in the number of DISTINCT terms per group. For
    * corpora where per-group vocabulary outgrows executor memory, cap the
    * buffer by periodically evicting min-count entries (Misra-Gries) and
    * the result becomes approximate with the usual ±N/cap guarantee.
    */
  final class TopKTerms(k: Int)
      extends Aggregator[Seq[String], mutable.HashMap[String, Long], Seq[TermCount]] {

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(
        buf: mutable.HashMap[String, Long],
        toks: Seq[String]
    ): mutable.HashMap[String, Long] = {
      if (toks != null) toks.foreach { t => buf.update(t, buf.getOrElse(t, 0L) + 1L) }
      buf
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]
    ): mutable.HashMap[String, Long] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      small.foreach { case (t, n) => big.update(t, big.getOrElse(t, 0L) + n) }
      big
    }

    override def finish(buf: mutable.HashMap[String, Long]): Seq[TermCount] =
      buf.toSeq
        .sortBy { case (t, n) => (-n, t) }
        .take(k)
        .map { case (t, n) => TermCount(t, n) }

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[TermCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermCount]]()
  }

  /** KMV (k-minimum-values) distinct-count sketch: the buffer retains the k
    * smallest DISTINCT hash values seen, nothing else — constant memory per
    * group (k longs) under any data size, the same scaling contract as HLL.
    *
    * Unlike HLL++, the retained set is a pure function of the input SET
    * (k smallest distinct values are merge-order-independent), so the sketch
    * — and the estimate derived from it, (k−1)·P / kth_smallest for hashes
    * uniform on [0,P) — is deterministic and reproducible in any engine that
    * can sort: an exact cross-engine oracle target, not just a bounds check.
    * finish() returns the retained hashes ascending; if fewer than k remain
    * the distinct count is exact (= size).
    */
  final class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 1, "k must be positive")

    // buffer = sorted distinct hashes, length <= k; a plain Array round-trips
    // through the native encoder (no Kryo) and k is small (64), so the O(k)
    // insertion copy is cheaper than any tree's pointer chasing
    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // h beats the current k-th smallest
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // merge two sorted distinct arrays, keep the k smallest distinct
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bounded-memory heavy hitters: the Misra-Gries summary [[TopKTerms]]'s
    * Scaladoc promises for vocabularies that outgrow executor memory.
    *
    * The buffer never exceeds `cap` entries. Guarantees (for N total token
    * occurrences in the group, under ANY partition/merge order):
    *   - reported(t) <= true(t)                  (never overcounts)
    *   - reported(t) >= true(t) - N/cap          (bounded undercount)
    *   - any t with true(t) > N/cap survives     (no false negatives among
    *     genuinely heavy terms)
    * Which LIGHT terms appear (with small residual counts) IS
    * merge-order-dependent — that is inherent to the sketch, so this
    * aggregate is spec-verified against its guarantees, not oracle-hashed.
    */
  /** The Misra-Gries decrement step: repeatedly subtract the minimum count
    * and evict zeroed entries until the buffer fits `size`. Shared by the
    * batch [[TopKTermsCapped]] aggregator and the streaming
    * [[graft.streaming.StreamingHeavyHitters]] state fold — one
    * implementation, one set of guarantees.
    */
  private[graft] def misraGriesShrink(buf: mutable.HashMap[String, Long], size: Int): Unit =
    while (buf.size > size) {
      val m = buf.valuesIterator.min
      val dead = buf.iterator.collect { case (t, n) if n <= m => t }.toList
      buf.mapValuesInPlace((_, n) => n - m)
      dead.foreach(buf.remove)
    }

  final class TopKTermsCapped(k: Int, cap: Int)
      extends Aggregator[Seq[String], mutable.HashMap[String, Long], Seq[TermCount]] {
    require(cap >= k, "cap must be at least k")

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    private def shrinkTo(buf: mutable.HashMap[String, Long], size: Int): Unit =
      misraGriesShrink(buf, size)

    override def reduce(
        buf: mutable.HashMap[String, Long],
        toks: Seq[String]
    ): mutable.HashMap[String, Long] = {
      if (toks != null) toks.foreach { t =>
        buf.get(t) match {
          case Some(n) => buf.update(t, n + 1L)
          case None =>
            buf.update(t, 1L)
            if (buf.size > cap) shrinkTo(buf, cap)
        }
      }
      buf
    }

    override def merge(
        a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]
    ): mutable.HashMap[String, Long] = {
      b.foreach { case (t, n) => a.update(t, a.getOrElse(t, 0L) + n) }
      shrinkTo(a, cap)
      a
    }

    override def finish(buf: mutable.HashMap[String, Long]): Seq[TermCount] =
      buf.toSeq
        .sortBy { case (t, n) => (-n, t) }
        .take(k)
        .map { case (t, n) => TermCount(t, n) }

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[TermCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermCount]]()
  }

  /** One retained row of a weighted priority sample: the DLT priority, the
    * document's stable id (the deterministic tiebreak), and its weight.
    */
  final case class SampleRow(priority: Long, docId: Long, w: Long)

  /** Bounded priority-sample sketch: retains the k smallest rows by
    * (priority, docId) — the Duffield-Lund-Thorup weighted sample p22
    * computes with a rank window, as a MERGEABLE aggregate whose buffer
    * never exceeds k rows. Insertion order cannot matter (the k smallest
    * under a total order are set-determined), so reduce/merge are
    * commutative+associative and the result is bit-reproducible across
    * partitionings, retries, and engines — and the same buffer serves as
    * bounded streaming-aggregation state (k rows per group FOREVER),
    * which is what makes it p22's streaming twin.
    */
  final class PrioritySampleK(k: Int)
      extends Aggregator[SampleRow, Seq[SampleRow], Seq[SampleRow]] {
    require(k >= 1, s"sample size must be >= 1, got $k")

    private def lt(a: SampleRow, b: SampleRow): Boolean =
      a.priority < b.priority || (a.priority == b.priority && a.docId < b.docId)

    override def zero: Seq[SampleRow] = Vector.empty

    override def reduce(buf: Seq[SampleRow], r: SampleRow): Seq[SampleRow] = {
      // buf is kept sorted ascending; the common case at steady state is a
      // row worse than the current k-th — O(1) reject
      if (buf.length >= k && !lt(r, buf.last)) buf
      else {
        val i = buf.indexWhere(b => lt(r, b)) match {
          case -1 => buf.length
          case j  => j
        }
        val grown = (buf.take(i) :+ r) ++ buf.drop(i)
        if (grown.length > k) grown.take(k) else grown
      }
    }

    override def merge(a: Seq[SampleRow], b: Seq[SampleRow]): Seq[SampleRow] = {
      // merge two sorted runs, keep the k smallest
      val out = Vector.newBuilder[SampleRow]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && lt(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[SampleRow]): Seq[SampleRow] = buf

    override def bufferEncoder: Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()

    override def outputEncoder: Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleRow]]()
  }
}
