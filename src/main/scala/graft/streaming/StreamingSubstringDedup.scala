package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextExpressions

/** One (gram fingerprint, document, position) hit of the stride-1 k-gram
  * pass: `fp` is the u64 rolling fingerprint d31 keys its postings by.
  */
case class GramHit(fp: Long, docId: Long, pos: Int)

/** Keyed state per distinct gram fingerprint: the first observation
  * (document + position) and whether that first position was already
  * emitted as duplicated. ~25 bytes per distinct gram.
  */
case class GramOwner(docId: Long, pos: Int, emitted: Boolean)

/** A token position participating in a duplicated substring: gram
  * `[pos, pos + k - 1]` of `docId` occurs at least twice corpus-wide.
  */
case class DupGramPos(docId: Long, pos: Int)

/** Streaming substring dedup — the Structured Streaming twin of the batch
  * rolling-fingerprint substring-span dedup (`d31_substring_spans_hashed`
  * oracle; Lee et al. "Deduplicating Training Data" §4.1): documents arrive
  * as a stream, every stride-1 token k-gram lands in per-FINGERPRINT
  * first-claim state, and the moment a gram is observed a second time BOTH
  * its positions surface as [[DupGramPos]] rows — without ever re-joining
  * history.
  *
  * Exactness: unlike [[StreamingSemDedup]] (whose bounded state restricts
  * scoring to cell owners, a documented subset), this twin converges to the
  * batch semantics EXACTLY. Batch d31 marks position p of a doc duplicated
  * iff its gram fingerprint has global occurrence count ≥ 2; the streaming
  * state emits the owner's position on the second observation (once — the
  * `emitted` flag) and every later observation's position as it arrives, so
  * after the corpus has streamed through — in ANY batching and ANY arrival
  * order — the emitted position set equals the batch `p` frame bit for bit,
  * and [[spans]] (the same interval-merge plan) reproduces d31's per-doc
  * span counts and duplicated-token counts exactly. The differential spec
  * pins that equality on the test corpus.
  *
  * Scale: [[gramHits]] is a pure per-row map through the compiled
  * [[TextExpressions.gramFingerprintsK]] kernel (no shuffle; one u64 per
  * token, ~8 bytes — the same reason d31 fingerprints its postings).
  * [[dupPositions]] shuffles hits by fingerprint once per micro-batch; the
  * state holds ONE ~25-byte row per DISTINCT gram fingerprint — the
  * streaming analog of d31's df≥2 aggregate, O(gram vocabulary), never
  * O(corpus positions), because every fingerprint past its second
  * observation stores nothing new. For bounded retention on endless
  * streams, evict grams not re-seen within a freshness horizon
  * (ProcessingTimeTimeout / keying by (fp, day)) — collision semantics
  * within the horizon are unchanged; corpus-wide replay (the StreamBench
  * scenario) keeps NoTimeout, matching the batch corpus-wide definition.
  */
object StreamingSubstringDedup {

  /** Gram width — matches d19/d31's 10-token grams. */
  val K = 10

  /** `(doc_id, text)` stream → exploded fingerprint hits. Pure per-row map
    * (tokenize → compiled rolling fingerprints → posexplode): no shuffle,
    * safe on unbounded streams. Documents shorter than k tokens contribute
    * nothing, exactly as in batch.
    */
  def gramHits(docs: DataFrame, k: Int = K): Dataset[GramHit] = {
    implicit val enc = Encoders.product[GramHit]
    docs
      .select(col("doc_id"),
        posexplode(TextExpressions.gramFingerprintsK(split(col("text"), " "), k))
          .as(Seq("p0", "fp")))
      .select(col("fp"), col("doc_id").as("docId"), (col("p0") + 1).cast("int").as("pos"))
      .as[GramHit]
  }

  /** Fingerprint-hit stream → duplicated positions via per-gram first-claim
    * state. Append mode: each (doc, pos) emits AT MOST once — on the batch
    * where its gram's second observation lands (both positions emit
    * together), or immediately if the gram is already known duplicated.
    * In-batch ties resolve in (docId, pos) order (deterministic under
    * micro-batch replay).
    */
  def dupPositions(hits: Dataset[GramHit]): Dataset[DupGramPos] = {
    implicit val outEnc = Encoders.product[DupGramPos]
    implicit val stateEnc = Encoders.product[GramOwner]
    implicit val keyEnc = Encoders.scalaLong
    hits
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[GramHit], state: GroupState[GramOwner]) => {
          val rows = it.toSeq.sortBy(h => (h.docId, h.pos))
          state.getOption match {
            case Some(o) if o.emitted =>
              // gram already known duplicated: every new position emits
              rows.iterator.map(h => DupGramPos(h.docId, h.pos))
            case Some(o) =>
              // second observation(s): the owner's held-back position
              // finally emits, together with the batch's
              state.update(o.copy(emitted = true))
              (DupGramPos(o.docId, o.pos) +:
                rows.map(h => DupGramPos(h.docId, h.pos))).iterator
            case None if rows.size >= 2 =>
              // gram born duplicated inside one batch
              state.update(GramOwner(rows.head.docId, rows.head.pos, emitted = true))
              rows.iterator.map(h => DupGramPos(h.docId, h.pos))
            case None =>
              // first observation: claim, emit nothing yet
              state.update(GramOwner(rows.head.docId, rows.head.pos, emitted = false))
              Iterator.empty
          }
        }
      )
  }

  /** Duplicated-position frame → maximal per-doc spans — the identical
    * interval-merge plan batch d31 runs (overlapping/adjacent `[pos,
    * pos+k-1]` windows union into islands; per-DOC window partitions, even
    * distribution). Batch-side helper: run it over the accumulated
    * [[DupGramPos]] output (e.g. in foreachBatch or after the stream
    * drains) to get `(doc_id, n_dup_spans, dup_tokens)` rows comparable
    * cell-for-cell with d31's span columns.
    */
  def spans(dupPos: DataFrame, k: Int = K): DataFrame = {
    val w = Window.partitionBy(col("docId")).orderBy(col("pos"))
    dupPos
      .withColumn("prev_end",
        max(col("pos") + (k - 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("docId"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
      .groupBy(col("docId"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"))
      .select(col("docId").as("doc_id"), col("n_dup_spans"), col("dup_tokens"))
  }

  /** Full pipeline: document stream → duplicated-position stream. */
  def run(docs: DataFrame, k: Int = K): Dataset[DupGramPos] =
    dupPositions(gramHits(docs, k))
}
