package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.CmsSketch

/** Streaming Count-Min point frequencies — the Structured Streaming twin of
  * the batch CMS (`t26_cms_token_freq` / [[graft.ops.CmsSketch]]), and the
  * fourth leg of the bounded-streaming-sketch suite beside quantiles
  * ([[StreamingHdrQuantiles]]), samples ([[StreamingPrioritySample]]) and
  * distinct counts ([[StreamingDistinctKmv]]).
  *
  * The sketch IS a streaming aggregation: [[sketchCells]] runs the exact
  * batch column spelling (`CmsSketch.bucketize` → `CmsSketch.counts`) as a
  * built-in stateful `groupBy(row_i, bucket).count()`, so
  *
  *   - ingestion is fully parallel — each micro-batch partial-aggregates
  *     map-side before the shuffle (the CMS has FEW cells and MANY rows,
  *     the shape where a keyed `mapGroupsWithState` fold would funnel);
  *   - state is one count row per live cell — ≤ depth·width (4×512 =
  *     2,048 at the defaults) FOREVER, regardless of stream length or
  *     vocabulary growth, which also bounds the Complete-mode emission;
  *   - nothing is fitted or frozen: the hash rows are fixed constants, so
  *     no corpus statistic parameterizes the stream and it never needs a
  *     refit — like the HDR twin, unlike the dedup/ANN twins'
  *     fit-time-frozen LSH widths.
  *
  * Cell counts are exact and addition commutes, so after replaying any
  * prefix in ANY batching the snapshot equals the batch sketch over that
  * prefix cell-for-cell — and therefore every point-frequency estimate
  * ([[probeOf]], literally the batch `CmsSketch.probe` over the snapshot)
  * equals the batch answer too. The differential spec pins exact equality
  * on every prefix and ties the full replay back to the oracled t26 rows.
  */
object StreamingCmsFrequency {

  /** `(h)` stream (hashes on [0, P)) → stateful cell-count sketch
    * (Complete mode emits the whole ≤ depth·width-row sketch each batch).
    * The same `bucketize → counts` column pipeline the oracled t26 plan
    * runs.
    */
  def sketchCells(values: DataFrame,
      depth: Int = CmsSketch.DefaultDepth,
      width: Int = CmsSketch.DefaultWidth): DataFrame =
    CmsSketch.counts(
      CmsSketch.bucketizeDw(
        values.select(col("h").cast("long").as("h")), col("h"), depth, width))

  /** Point-frequency estimates from a sketch snapshot — the same
    * min-over-cells semantics as the batch `CmsSketch.probe`, but with the
    * SNAPSHOT as the join mainline and the (bounded) watchlist broadcast:
    * inside `foreachBatch` the Complete-mode snapshot is backed by the
    * state-store scan, and hiding it behind a broadcast exchange would
    * collect it on a side path that skips the store's per-partition commit
    * accounting (Spark's batch-commit validation rejects exactly that).
    * The right-outer join keeps every watchlist cell, so unseen keys still
    * read 0.
    */
  def probeOf(snapshot: DataFrame, keys: DataFrame, h: Column,
      keyCols: Column*): DataFrame =
    snapshot
      .join(broadcast(CmsSketch.bucketize(keys, h, keyCols: _*)),
        Seq("row_i", "bucket"), "right_outer")
      .groupBy(keyCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** WINDOWED form — the watermark-append twin of `e22_windowed_user_freq`:
    * the same `bucketize → counts` pipeline grouped by the event-time
    * window, under a watermark. In append mode each (window, row_i,
    * bucket, cnt) cell row is emitted EXACTLY ONCE when the watermark
    * closes its window, and the state store holds only in-flight windows'
    * cells (≤ depth·width per open window), EVICTED on finalization —
    * Spark's windowed-agg state lifecycle reused rather than
    * re-implemented. Finalized cells probe exactly like a batch sketch
    * (the differential spec pins finalized-window estimates against
    * oracled e22).
    */
  def windowedSketchCells(events: DataFrame, windowDur: String, delay: String,
      depth: Int = CmsSketch.DefaultDepth,
      width: Int = CmsSketch.DefaultWidth): DataFrame = {
    val typed = events
      .select(col("ts"), col("h").cast("long").as("h"))
      .withWatermark("ts", delay)
    CmsSketch.counts(
      CmsSketch.bucketizeDw(typed, col("h"), depth, width,
        window(col("ts"), windowDur).as("w")),
      col("w"))
  }
}
