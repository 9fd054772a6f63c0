package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorExpressions.lshBucketDyn

/** One (LSH cell, vector) hit: `cellKey` is "tbl:bucket" over the 4-table
  * wide code at the frozen width.
  */
case class VecCellHit(cellKey: String, vecId: Long, emb: Array[Float])

/** Keyed state: the first vector that claimed an LSH cell — id plus its
  * embedding (the 64-dim payload is ~256 B, so state stays
  * O(distinct cells) x constant, never O(vectors)).
  */
case class CellOwner(vecId: Long, emb: Array[Float])

/** A later vector colliding with a cell owner, with the exact quantized
  * cosine already verified in the same micro-batch.
  */
case class SemDupCandidate(vecId: Long, ownerId: Long, cellKey: String, cosSim: Double)

/** Streaming SemDeDup — the Structured Streaming twin of the batch
  * adaptive-width semantic dedup (`d29_semdedup_adaptive` oracle): vectors
  * arrive as a stream, land in the same 4-table wide-code LSH cells the
  * batch plan uses, and any vector colliding with a cell's FIRST claimant
  * surfaces as an exact-cosine-verified [[SemDupCandidate]] in the same
  * micro-batch — without ever re-joining history.
  *
  * The adaptive code width is FROZEN AT FIT TIME: [[fitK]] evaluates d29's
  * integer-exact formula (k = len(bin(ceil(n/8))) clamped to [4,16]) over
  * the standing corpus once, and every micro-batch then rides the same
  * compiled [[graft.functions.LshBucketDyn]] kernel at that width — the
  * streaming analog of d29 deriving k in-plan from a broadcast count. When
  * the corpus outgrows the fitted width (cells densify past ~8 owners'
  * worth), refit and restart with a wider code; the formula makes that a
  * mechanical check, not a tuning decision.
  *
  * Semantics vs batch d29: the batch plan scores every prior cell-sharing
  * vector; bounded state cannot hold them all, so the streaming twin scores
  * against each cell's OWNER (first claimant — the min vec_id under
  * id-ordered replay, exactly [[StreamingDedup]]'s first-claim convention),
  * and [[candidates]] only emits a pair when the colliding vector's id is
  * GREATER than the owner's. Under out-of-order arrival a lower-id vector
  * can reach a cell after a higher-id owner claimed it; that collision is
  * suppressed rather than emitted, so in ANY arrival order every emitted
  * pair is one of d29's candidate pairs (owner
  * shares a cell and precedes the vector), and per-vector max(cosSim) is a
  * LOWER BOUND on d29's best_prior_sim and the dup set at any threshold is
  * a subset of d29's — the conservative direction for a dedup gate (never
  * drops a document d29 would keep). The differential spec pins both the
  * subset relation and exact equality against the owner-restricted batch
  * formulation.
  *
  * Zero-norm embeddings have no defined cosine; the batch twin drops their
  * NULL similarity before ranking, and [[candidates]] mirrors that by not
  * emitting them (they can still own a cell, exactly as in batch where a
  * zero-norm prior appears as a candidate row with NULL cos_sim).
  *
  * Cosine arithmetic is bit-identical to the compiled batch kernels
  * (element-wise float→double, left-to-right sums, floor-quantize 1e-6) —
  * the same parity contract [[graft.functions.VectorExpressions]] documents.
  */
object StreamingSemDedup {

  /** Tables in the wide code — matches d29/s22 (plane offsets t*20). */
  val L = 4

  /** d29's corpus-adaptive width formula: k = len(bin(ceil(n/8))) clamped
    * to [4,16] — between the clamps, 2^(k-1) <= ceil(n/8) < 2^k, so the
    * per-table density n/2^k sits in [4, 16) (~8 on average) at ANY corpus
    * size. Integer-exact (no float log2 at a cell boundary), matching the
    * in-plan SQL spelling in d29/s22 bit for bit.
    */
  def widthFor(n: Long): Int =
    math.max(4, math.min(16, java.lang.Long.toBinaryString((n + 7) / 8).length))

  /** The formula evaluated once at fit time over the standing corpus. */
  def fitK(corpus: DataFrame): Int = widthFor(corpus.count())

  /** `(vec_id, embedding)` stream → exploded (cell, vector) hits at the
    * frozen width. Pure per-row map through the compiled kernel: no
    * shuffle, safe on unbounded streams.
    */
  def cellHits(vecs: DataFrame, k: Int): Dataset[VecCellHit] = {
    implicit val enc = Encoders.product[VecCellHit]
    val cells = array((0 until L).map { t =>
      concat_ws(":", lit(t), lshBucketDyn(col("embedding"), lit(k), t * 20))
    }: _*)
    vecs
      .select(col("vec_id").as("vecId"), col("embedding").as("emb"), explode(cells).as("cellKey"))
      .select(col("cellKey"), col("vecId"), col("emb"))
      .as[VecCellHit]
  }

  /** Exact quantized cosine, bit-identical to the batch column spelling
    * `quant(dot(a,b) / when(norm(a)*norm(b) > 0, norm(a)*norm(b)), 1e6)`:
    * None iff either norm is zero (the batch NULL).
    */
  private[streaming] def cosQ(a: Array[Float], b: Array[Float]): Option[Double] = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { val x = b(i).toDouble; nb += x * x; i += 1 }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den > 0.0) Some(math.floor(d / den * 1e6) / 1e6) else None
  }

  /** Cell-hit stream → verified duplicate candidates via per-cell
    * first-claim state. Append mode: a (vector, cell) collision emits at
    * most once, in the micro-batch where it happens. In-batch ties resolve
    * to the minimum vec_id (deterministic under micro-batch replay).
    */
  def candidates(hits: Dataset[VecCellHit]): Dataset[SemDupCandidate] = {
    implicit val outEnc = Encoders.product[SemDupCandidate]
    implicit val stateEnc = Encoders.product[CellOwner]
    implicit val keyEnc = Encoders.STRING
    hits
      .groupByKey(_.cellKey)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[VecCellHit], state: GroupState[CellOwner]) => {
          // one hit per (cell, vector) by construction; order by id so the
          // in-batch owner is the min id, like the batch keep-lowest-id
          val rows = it.toSeq.sortBy(_.vecId)
          val (owner, rest) = state.getOption match {
            case Some(o) => (o, rows)
            case None =>
              val o = CellOwner(rows.head.vecId, rows.head.emb)
              state.update(o)
              (o, rows.tail)
          }
          rest.iterator
            .filter(_.vecId > owner.vecId)
            .flatMap(h => cosQ(h.emb, owner.emb)
              .map(c => SemDupCandidate(h.vecId, owner.vecId, key, c)))
        }
      )
  }

  /** Full pipeline at a fit-time-frozen width: embedding stream →
    * exact-cosine-verified semantic-dup candidates.
    */
  def run(vecs: DataFrame, k: Int): Dataset[SemDupCandidate] =
    candidates(cellHits(vecs, k))
}
