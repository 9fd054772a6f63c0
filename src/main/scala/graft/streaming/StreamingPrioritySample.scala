package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.Aggregates
import graft.functions.Aggregates.SampleRow
import graft.functions.TextOps.tokens

/** Streaming weighted priority sampling — the Structured Streaming twin of
  * the batch `p22_priority_sample` oracle (Duffield-Lund-Thorup shape):
  * documents arrive as a stream and each source keeps the k smallest
  * (priority, doc_id) rows, where priority = hash(id)·1000 DIV weight, so
  * selection probability tracks token weight with a draw that is pure
  * integer arithmetic — bit-reproducible across retries, batchings, and
  * engines.
  *
  * The sample IS a streaming aggregation over the bounded
  * [[Aggregates.PrioritySampleK]] sketch: the aggregation buffer (= the
  * state-store row per source) holds AT MOST k rows forever, and because
  * the k smallest under a total order are determined by the SET of rows
  * seen, the Complete-mode snapshot after any prefix is identical
  * row-for-row to p22's rank-window formulation over that prefix in ANY
  * arrival order or batching — exact equality, which the differential spec
  * pins, with the full replay tied back to the oracled p22 aggregate.
  *
  * Contrast the batch plan: p22's rank window sorts each source's rows per
  * query; the streaming sketch pays O(log k) per arriving row once,
  * which is also the right BATCH shape at 100 TB when k ≪ rows-per-source
  * (one map-side-combined buffer per mapper instead of a full sort) — the
  * same argument as TopKTerms.
  */
object StreamingPrioritySample {

  /** Sample size per source — matches p22's `rk <= 25`. */
  val DefaultK = 25

  /** p22's deterministic priority projection, verbatim: weight = token
    * count (zero-weight docs are excluded), u = multiplicative hash of the
    * stable id on the 1e9+7 grid, priority = u·1000 DIV w. The
    * differential spec enforces that this stays in lockstep with the
    * oracled batch spelling.
    */
  def priorityRows(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id").cast("long").as("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("w"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("source"), col("w"),
        expr("((doc_id % 1000000007) * 654435747) % 1000000007 * 1000 DIV w")
          .as("priority"))

  /** `(doc_id, source, text)` stream → per-source bounded priority sample
    * (Complete mode: one row per source, `sample` = the current k rows
    * sorted by (priority, doc_id)).
    */
  def run(docs: DataFrame, k: Int = DefaultK): DataFrame = {
    val sampler = udaf(new Aggregates.PrioritySampleK(k), Encoders.product[SampleRow])
    priorityRows(docs)
      .groupBy(col("source"))
      .agg(sampler(col("priority"), col("doc_id"), col("w")).as("sample"))
  }
}
