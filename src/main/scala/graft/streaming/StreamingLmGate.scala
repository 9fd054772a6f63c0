package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming perplexity quality gate — the production shape of the CCNet
  * filter (`t25_perplexity_buckets`'s streaming twin): the bigram LM and
  * the head/middle/tail thresholds are FIT ONCE on a reference corpus and
  * FROZEN; incoming documents are then scored and bucketed per micro-batch
  * against that snapshot. This is exactly how the filter deploys at 100 TB:
  * the global tertile ranks exist only at fit time (they need the whole
  * reference corpus); the serving path applies the boundary scores as
  * constants, so scoring is a stateless stream-static join with no global
  * coordination, no watermark, no accumulating state.
  *
  * Parity: scores use t25's integer micro-nat grid (each bigram's smoothed
  * log-prob floor-quantized BEFORE the per-doc sum, per-doc mean as exact
  * integer DIV), so batch and streaming produce bit-identical scores and —
  * because the thresholds are the fitted tertiles' own boundary scores —
  * identical bucket assignments whenever no two docs tie exactly on a
  * boundary score (asserted in the differential spec).
  *
  * Scale: `fit` is one batch job (two LM aggregates + GlobalOrder tertile,
  * all shuffle-planar). `scoreBatch` joins the micro-batch's exploded
  * bigrams against the static `c2`/`c1` tables — per-batch cost tracks the
  * BATCH size; the LM tables ride whatever layout they were written with
  * (broadcast when small, bucketed when not) because the static side is
  * re-planned per micro-batch.
  */
object StreamingLmGate {

  /** Frozen model: bigram counts, left-token totals, vocabulary size, and
    * the two bucket boundary scores (minimum score still inside the head /
    * middle tertile of the reference corpus).
    */
  final case class LmSnapshot(
      c2: DataFrame,
      c1: DataFrame,
      vocab: Long,
      headMin: Long,
      middleMin: Long)

  private def bigrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.TextOps.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(tk) - 1), " +
          "i -> struct(element_at(tk, i) AS w1, element_at(tk, i + 1) AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Per-doc integer LM score (t25's grid): callable on any BATCH frame —
    * the same function runs inside `foreachBatch` on the stream and in the
    * batch differential. Unseen bigrams/left-tokens smooth through the
    * coalesced zero counts (add-one numerator, vocab denominator).
    */
  def scoreBatch(docs: DataFrame, lm: LmSnapshot): DataFrame =
    bigrams(docs)
      .join(lm.c2.select(col("w1"), col("w2"), col("n2")), Seq("w1", "w2"), "left")
      .join(lm.c1.select(col("w1"), col("n1")), Seq("w1"), "left")
      .select(col("doc_id"),
        floor(log((coalesce(col("n2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("n1"), lit(0L)) + lit(lm.vocab)).cast("double")) * 1e6)
          .cast("long").as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("sum_q"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_q DIV n_bigrams").as("score"))
      .withColumn("bucket",
        when(col("score") >= lm.headMin, "head")
          .when(col("score") >= lm.middleMin, "middle")
          .otherwise("tail"))

  /** Fit the frozen snapshot on a reference corpus: LM counts + the tertile
    * boundary scores, computed with the SAME global ranking t25 uses
    * (GlobalOrder range shuffle — no single-partition window). The two
    * boundary scores are the only driver-side values; the LM tables stay
    * distributed.
    */
  def fit(corpus: DataFrame): LmSnapshot = {
    val bg = bigrams(corpus)
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
      .localCheckpoint()
    val c1 = c2.groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
      .localCheckpoint()
    val vocab = corpus
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head.getLong(0)
    val snap0 = LmSnapshot(c2, c1, vocab, Long.MinValue, Long.MinValue)
    val scored = scoreBatch(corpus, snap0).select(col("doc_id"), col("score"))
    val n = scored.count()
    val ranked = graft.ops.GlobalOrder
      .withRowNumber(scored, "rn", col("score").desc, col("doc_id"))
    val bounds = ranked
      .select(col("score"),
        when(col("rn") * 3 <= n, "head")
          .when(col("rn") * 3 <= n * 2, "middle")
          .otherwise("tail").as("bucket"))
      .groupBy(col("bucket")).agg(min(col("score")).as("mn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    snap0.copy(
      headMin = bounds.getOrElse("head", Long.MinValue),
      middleMin = bounds.getOrElse("middle", Long.MinValue))
  }
}
