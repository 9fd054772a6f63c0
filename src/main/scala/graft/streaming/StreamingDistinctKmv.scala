package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.functions.Aggregates

/** Streaming KMV distinct counting — the Structured Streaming twin of the
  * batch k-minimum-values sketch (`x3_approx_sketches`' KMV half): hashed
  * keys arrive as a stream and each group keeps its k smallest DISTINCT
  * hash values, giving a lifetime distinct-count estimate
  * D̂ = (k−1)·P DIV kth in O(k) state per group FOREVER — the third leg of
  * the bounded-streaming-sketch triad beside quantiles
  * ([[StreamingHdrQuantiles]]) and samples ([[StreamingPrioritySample]]).
  *
  * The sketch IS a streaming aggregation over the mergeable
  * [[Aggregates.KmvSketch]]: its buffer (= the state-store row per group)
  * never exceeds k longs, and because the k smallest distinct values are
  * determined by the SET of hashes seen, the Complete-mode snapshot after
  * any prefix equals the batch aggregate over that prefix in ANY arrival
  * order or batching — exact equality (the sketch itself, not just the
  * estimate), which the differential spec pins against the oracled x3
  * columns.
  *
  * The estimate stays INTEGRAL ((k−1)·P DIV kth, exact when fewer than k
  * distinct hashes have arrived) so it is bit-stable across engines —
  * the same cross-engine-oracle property x3 documents, preserved under
  * streaming.
  *
  * Input contract: `(group, h)` where `h` is a hash uniform on [0, P) —
  * hashing stays with the caller so the sketch composes with any key type.
  */
object StreamingDistinctKmv {

  /** Sketch size — matches x3's k=64. */
  val DefaultK = 64

  /** The shared hash grid (1e9+7, the corpus-wide convention). */
  val P = 1000000007L

  /** `(group, h)` stream → per-group KMV state and distinct estimate
    * (Complete mode: one row per group with the retained ascending hashes,
    * the kth smallest, and the integral estimate).
    */
  def run(values: DataFrame, k: Int = DefaultK): DataFrame = {
    val kmv = udaf(new Aggregates.KmvSketch(k), Encoders.scalaLong)
    values
      .select(col("group").cast("string").as("group"), col("h").cast("long").as("h"))
      .groupBy(col("group"))
      .agg(kmv(col("h")).as("ret"))
      .select(
        col("group"), col("ret"),
        element_at(col("ret"), size(col("ret"))).as("kmv_kth"),
        expr(s"CASE WHEN size(ret) < $k THEN CAST(size(ret) AS BIGINT) " +
          s"ELSE ${(k - 1).toLong * P} DIV element_at(ret, size(ret)) END")
          .as("kmv_est"))
  }

  /** WINDOWED form — the watermark-append twin of `e24_windowed_uniques`
    * ("daily uniques"): the same KMV aggregation grouped by the event-time
    * window under a watermark. Append mode emits each window's (retained
    * hashes, kth, integral estimate) row EXACTLY ONCE on finalization; the
    * state store holds only in-flight windows' ≤ k-long buffers, evicted
    * as the watermark passes — Spark's windowed-agg lifecycle over the
    * mergeable sketch buffer. Because the k smallest DISTINCT hashes are
    * set-determined, a finalized window's row equals the batch aggregate
    * over that window in ANY arrival order or batching (the differential
    * spec pins finalized windows against oracled e24, in-order and
    * out-of-order).
    */
  def windowed(events: DataFrame, windowDur: String, delay: String,
      k: Int = DefaultK): DataFrame = {
    val kmv = udaf(new Aggregates.KmvSketch(k), Encoders.scalaLong)
    events
      .select(col("ts"), col("h").cast("long").as("h"))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(kmv(col("h")).as("ret"))
      .select(
        col("w"), col("ret"),
        element_at(col("ret"), size(col("ret"))).as("kmv_kth"),
        expr(s"CASE WHEN size(ret) < $k THEN CAST(size(ret) AS BIGINT) " +
          s"ELSE ${(k - 1).toLong * P} DIV element_at(ret, size(ret)) END")
          .as("kmv_est"))
  }
}
