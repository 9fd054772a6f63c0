package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Aggregates
import graft.functions.Aggregates.TermCount
import graft.functions.TextOps.tokens
import scala.collection.mutable

/** One document's token bag keyed by its stream group. */
case class TokenBag(group: String, toks: Seq[String])

/** Keyed state: the bounded Misra-Gries summary plus the running token
  * total — `counts` never exceeds `cap` entries regardless of stream length.
  */
case class MgSummary(counts: Map[String, Long], total: Long)

/** Per-batch emission: the group's current top-k candidates with the
  * stream-lifetime token total (so consumers can apply the N/cap bound).
  */
case class HeavyHitterUpdate(group: String, total: Long, top: Seq[TermCount])

/** Streaming Misra-Gries heavy hitters — the Structured Streaming twin of
  * the batch `x22_heavy_hitters` pipeline, sharing the SAME decrement step
  * ([[Aggregates.misraGriesShrink]]) so both carry identical guarantees:
  *
  *   - state per group is ≤ `cap` (term, count) entries FOREVER — the
  *     summary never grows with the stream, the defining property that
  *     makes corpus-lifetime frequency tracking feasible in a stream;
  *   - reported(t) ≤ true(t) ≤ reported(t) + N/cap for the group's
  *     lifetime token total N — so every term with true share > N/cap is
  *     guaranteed present in the state (no false negatives among genuinely
  *     heavy terms), exactly the candidate-completeness fact x22's exact
  *     second pass relies on.
  *
  * Each micro-batch folds its token bags into the summary and emits the
  * current top-k (count desc, term asc — deterministic under replay of a
  * whole micro-batch, since the fold order inside a batch is made
  * deterministic by sorting the bags). Update output mode: one row per
  * (group, batch). A downstream exact recount (x22's pass 2 as a periodic
  * batch job over the candidates) upgrades the sketch to exact whenever
  * needed — the lambda-architecture split, both halves of which this repo
  * tests.
  */
object StreamingHeavyHitters {

  /** `(group, text)` stream → per-batch bounded heavy-hitter updates. */
  def run(docs: DataFrame, groupCol: String, textCol: String,
      k: Int, cap: Int): Dataset[HeavyHitterUpdate] = {
    require(cap >= k, "cap must be at least k")
    implicit val bagEnc = Encoders.product[TokenBag]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[MgSummary]
    implicit val outEnc = Encoders.product[HeavyHitterUpdate]
    docs
      .select(col(groupCol).cast("string").as("group"), tokens(col(textCol)).as("toks"))
      .as[TokenBag]
      .groupByKey(_.group)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (key: String, bags: Iterator[TokenBag], state: GroupState[MgSummary]) => {
          val buf = mutable.HashMap.empty[String, Long]
          var total = 0L
          state.getOption.foreach { s => buf ++= s.counts; total = s.total }
          // deterministic fold order inside the micro-batch (replay-safe)
          bags.toSeq.sortBy(b => (b.toks.length, b.toks.mkString(" "))).foreach { bag =>
            bag.toks.foreach { t =>
              total += 1L
              buf.get(t) match {
                case Some(n) => buf.update(t, n + 1L)
                case None =>
                  buf.update(t, 1L)
                  if (buf.size > cap) Aggregates.misraGriesShrink(buf, cap)
              }
            }
          }
          state.update(MgSummary(buf.toMap, total))
          val top = buf.toSeq
            .sortBy { case (t, n) => (-n, t) }
            .take(k)
            .map { case (t, n) => TermCount(t, n) }
          HeavyHitterUpdate(key, total, top)
        })
  }
}
