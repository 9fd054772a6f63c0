package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.HdrSketch

/** Streaming HDR quantiles — the Structured Streaming twin of the batch
  * log-bucket quantile sketch (`x32_hdr_quantiles` /
  * [[graft.ops.HdrSketch]]).
  *
  * The sketch IS a streaming aggregation: [[sketchCounts]] runs the exact
  * batch column spelling (`HdrSketch.bucketize` → `HdrSketch.counts`) as a
  * built-in stateful `groupBy(group, bucket).count()`, so
  *
  *   - ingestion is fully parallel — each micro-batch partial-aggregates
  *     map-side before the shuffle, so per-batch cost tracks batch size and
  *     never funnels through one task per group (the trap a keyed
  *     `mapGroupsWithState` fold would hit here: quantiles have FEW groups
  *     and MANY rows, the opposite shape of the dedup twins' many-cells
  *     keying);
  *   - state is one count row per live (group, bucket) — bounded by the
  *     bucket space itself (≤ ~64·2^bits per group, ~2k at the default
  *     bits=5) FOREVER, regardless of stream length, which also bounds the
  *     Complete-mode emission;
  *   - nothing is fitted or frozen: log bucketing is value-range-adaptive
  *     by construction, so no corpus statistic parameterizes the stream and
  *     it never needs a refit as the corpus grows — unlike the dedup/ANN
  *     twins' fit-time-frozen LSH widths.
  *
  * Per-batch quantiles come from [[quantilesOf]] applied in `foreachBatch`
  * to the Complete-mode snapshot — literally the batch
  * `HdrSketch.estimates` plan over a ≤ groups × 2k-row frame, so the
  * streaming path reuses the oracled batch code end to end rather than a
  * JVM re-implementation. Counts are exact and addition commutes, so after
  * replaying any prefix in ANY batching the snapshot quantiles are
  * IDENTICAL row-for-row to batch x32 over that prefix (the differential
  * spec pins exact equality, not a subset relation).
  */
object StreamingHdrQuantiles {

  /** `(group, v)` stream → stateful bucket-count sketch (Complete mode
    * emits the whole ≤ groups × 2k-row sketch each batch). The same
    * `bucketize → counts` column pipeline the oracled x32 plan runs.
    */
  def sketchCounts(values: DataFrame,
      bits: Int = HdrSketch.DefaultBits): DataFrame = {
    val typed = values.select(
      col("group").cast("string").as("group"), col("v").cast("long").as("v"))
    HdrSketch.counts(
      HdrSketch.bucketizeBits(typed, col("v"), bits, col("group")),
      col("group"))
  }

  /** Quantile rows from a sketch snapshot: batch `HdrSketch.estimates`
    * over the bounded bucket table — (group, q_label, num, den, est_lo,
    * est_hi, n_group). Run this inside `foreachBatch` on [[sketchCounts]]'s
    * Complete-mode output.
    */
  def quantilesOf(snapshot: DataFrame): DataFrame =
    HdrSketch.estimates(snapshot, col("group"))

  /** Event-time windowed form — the streaming twin of the oracled
    * `e21_windowed_quantiles` plan ("p99 per day per event type"): the SAME
    * `bucketize → counts` spelling grouped by `window(ts)` under a
    * watermark, run in APPEND mode so each (window, group, bucket) count
    * row is emitted exactly once, when the watermark passes the window
    * end. State holds only IN-FLIGHT windows' buckets (≤ live-windows ×
    * groups × ~2k rows) and the watermark EVICTS finalized windows — the
    * sketch inherits Spark's windowed-aggregation state lifecycle for
    * free, which a keyed custom fold would have to re-implement.
    * Finalized rows aggregate downstream with `HdrSketch.estimates`
    * (grouped by window + group), and because counts are exact the result
    * equals the batch e21 plan restricted to finalized windows, in any
    * batching — the differential spec pins it.
    *
    * Input contract: `(ts timestamp, group, v long)`.
    */
  def windowedSketchCounts(events: DataFrame, windowDur: String, delay: String,
      bits: Int = HdrSketch.DefaultBits): DataFrame = {
    val typed = events
      .select(col("ts"), col("group").cast("string").as("group"),
        col("v").cast("long").as("v"))
      .withWatermark("ts", delay)
    HdrSketch.counts(
      HdrSketch.bucketizeBits(typed, col("v"), bits,
        window(col("ts"), windowDur).as("w"), col("group")),
      col("w"), col("group"))
  }
}
