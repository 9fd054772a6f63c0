package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.AmsSketch

/** Streaming AMS F2 (self-join-size / skew) sketch — the Structured
  * Streaming twin of the batch AMS (`x38_ams_f2` / [[graft.ops.AmsSketch]]),
  * joining the bounded-streaming-sketch suite beside frequencies
  * ([[StreamingCmsFrequency]]), quantiles ([[StreamingHdrQuantiles]]),
  * distinct counts ([[StreamingDistinctKmv]]) and samples
  * ([[StreamingPrioritySample]]) — this one watches a stream's KEY SKEW,
  * the planning signal `x39_ams_salt` turns into a salt width.
  *
  * The sketch IS a streaming aggregation: [[sketchSums]] runs the exact
  * batch column spelling (`AmsSketch.bucketize` → `AmsSketch.sums`) as a
  * built-in stateful `groupBy(row_i).sum(sign)`, so
  *
  *   - ingestion is fully parallel — each micro-batch partial-aggregates
  *     map-side before the shuffle (16 cells, MANY rows: the shape where a
  *     keyed fold would funnel);
  *   - state is ≤ 16 longs FOREVER, regardless of stream length or key
  *     cardinality, which also bounds the Complete-mode emission;
  *   - nothing is fitted or frozen: the degree-3 sign coefficients are
  *     fixed constants, so no corpus statistic parameterizes the stream
  *     and it never needs a refit.
  *
  * Sign sums are exact integers and addition commutes, so after replaying
  * any prefix in ANY batching the snapshot equals the batch sketch over
  * that prefix Z-for-Z — and therefore [[estimateOf]] (literally the batch
  * `AmsSketch.estimate` over the snapshot) equals the batch F2 estimate
  * too. The differential spec pins exact equality on every prefix and ties
  * the full replay back to the oracled x38 estimates.
  */
object StreamingAmsF2 {

  /** `(h)` stream (hashes on [0, P)) → stateful 16-row sign-sum sketch
    * (Complete mode emits the whole sketch each batch). The same
    * `bucketize → sums` column pipeline the oracled x38 plan runs.
    */
  def sketchSums(values: DataFrame, rows: Int = AmsSketch.DefaultRows): DataFrame =
    AmsSketch.sums(
      AmsSketch.bucketizeR(
        values.select(col("h").cast("long").as("h")), col("h"), rows))

  /** F2 estimates from a sketch snapshot — the batch `AmsSketch.estimate`
    * verbatim: the snapshot is ≤ 16 rows, so the bounded collect_list
    * inside is bounded here too.
    */
  def estimateOf(snapshot: DataFrame): DataFrame =
    AmsSketch.estimate(snapshot)

  /** WINDOWED form — the watermark-append twin of `e23_windowed_skew`:
    * the same `bucketize → sums` pipeline grouped by the event-time
    * window, under a watermark. In append mode each (window, row_i, z)
    * row is emitted EXACTLY ONCE when the watermark closes its window,
    * and the state store holds only in-flight windows' 16 sign sums,
    * EVICTED on finalization — Spark's windowed-agg state lifecycle
    * reused rather than re-implemented. Finalized windows estimate
    * exactly like a batch sketch (the differential spec pins
    * finalized-window estimates against oracled e23, in-order and
    * out-of-order).
    */
  def windowedSketchSums(events: DataFrame, windowDur: String,
      delay: String, rows: Int = AmsSketch.DefaultRows): DataFrame = {
    val typed = events
      .select(col("ts"), col("h").cast("long").as("h"))
      .withWatermark("ts", delay)
    AmsSketch.sums(
      AmsSketch.bucketizeR(typed, col("h"), rows,
        window(col("ts"), windowDur).as("w")),
      col("w"))
  }
}
