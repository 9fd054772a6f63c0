package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HDR-style log-bucketed quantile sketch — the mergeable, bounded-state
  * production path for order statistics over non-negative integer values
  * (cents, token counts, latencies).
  *
  * Bucket scheme (HdrHistogram / DDSketch family, integer-exact,
  * parameterized by `bits` = sub-bucket bits per octave): a value c with
  * `msb = length(bin(c))` significant bits keeps its leading bit plus the
  * next `bits` (`sub`), so each power-of-two octave splits into 2^bits
  * sub-buckets: `bucket = msb * 2^bits + sub`. Every bucket's value range
  * `[lo, hi]` has width 2^(msb-1-bits), i.e. RELATIVE width <= 2^-bits
  * regardless of magnitude — at bits=5 that is 3.1% relative error from
  * ~2k buckets covering the ENTIRE 64-bit range (values below 2^(bits+1)
  * are exact, width-1 buckets). The sketch is then a pure
  * `groupBy(bucket).count()`: one map-side-combined shuffle of
  * O(groups x 2k) rows, mergeable across partitions / days / corpora by
  * adding counts, and O(buckets) streaming state. Contrast the two exact
  * paths it complements: `x2_percentiles` (per-group sort inside
  * `percentile`) and `ops/GlobalOrder` (range shuffle) pay per-ROW costs at
  * 100 TB; and the fixed-grid histogram in `x3_approx_sketches`, whose
  * $100-wide buckets grow in NUMBER with the value range and whose
  * ABSOLUTE error is magnitude-blind (a $100 grid is useless for $3 items).
  *
  * Everything is integer arithmetic (`length(bin())`, shifts, masks — the
  * same integer-msb trick d29 uses for its adaptive code width), so DuckDB
  * reproduces the sketch bit-for-bit and the driver hash-certifies it; the
  * rank inequality `cum*den >= n*num` keeps even the quantile thresholds
  * integral (no 0.9*n float, which the engines would type differently).
  *
  * The quantile estimate for rank r = ceil(q*n) is the picked bucket's
  * `[lo, hi]`: the rank-r order statistic provably lies inside it, which
  * `x33_hdr_certify` checks against the exact order statistic row by row.
  */
object HdrSketch {

  /** Default sub-bucket bits: 1/32 = 3.1% relative bucket width. */
  val DefaultBits = 5

  /** (msb, shift, sub, bucket, lo, hi) columns for a non-negative long
    * value column. `lo`/`hi` are the bucket's INCLUSIVE value bounds
    * (hi = lo + width - 1: an exclusive top bound for the highest octave
    * would be 2^63 and overflow under ANSI mode — inclusive bounds are
    * total over the whole long range); all six are pure per-row integer
    * expressions (codegen'd).
    */
  def bucketize(df: DataFrame, value: Column, groupCols: Column*): DataFrame =
    bucketizeBits(df, value, DefaultBits, groupCols: _*)

  def bucketizeBits(df: DataFrame, value: Column, bits: Int, groupCols: Column*): DataFrame = {
    require(bits >= 1 && bits <= 16, s"sub-bucket bits must be in [1,16], got $bits")
    val mask = (1L << bits) - 1
    // enforce the non-negative contract IN-PLAN: a negative long has
    // msb = 64 (bin() emits the 64-char two's complement) and would
    // silently corrupt lo/hi bounds, quantile picks, and
    // SketchPartitioner cuts — a bad feed must fail loudly (same policy
    // as the dyn vector kernels' bounds guards).
    df.select(groupCols :+ value.as("c"): _*)
      .withColumn("c", when(col("c") < 0, expr(
        "raise_error(concat('HdrSketch.bucketize: negative value ', CAST(c AS STRING), " +
          "' violates the non-negative contract'))").cast("long")).otherwise(col("c")))
      .withColumn("msb", length(bin(col("c"))).cast("long"))
      .withColumn("shift", greatest(col("msb") - (bits + 1), lit(0L)).cast("int"))
      .withColumn("sub", expr(s"shiftright(c, shift) & $mask"))
      .withColumn("bucket", col("msb") * (1L << bits) + col("sub"))
      .withColumn("lo", expr(
        s"CASE WHEN msb >= ${bits + 1} THEN shiftleft(${1L << bits} + sub, shift) ELSE sub END"))
      .withColumn("hi", col("lo") + expr("shiftleft(CAST(1 AS BIGINT), shift) - 1"))
  }

  /** The sketch itself: per (group, bucket) counts. Works identically as a
    * batch aggregate and as a streaming aggregation (state = one count per
    * live bucket). `lo`/`hi` are functionally dependent on `bucket`, so
    * carrying them in the key adds no groups.
    */
  def counts(bucketized: DataFrame, groupCols: Column*): DataFrame =
    bucketized
      .groupBy(groupCols :+ col("bucket") :+ col("lo") :+ col("hi"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Weighted sketch: per-bucket WEIGHT sums instead of row counts — the
    * sketch analog of the exact weighted median (`x17`), whose
    * "smallest value with cum·2 ≥ total" test [[estimates]] applies
    * unchanged because `cnt` only ever enters the cumulative-rank
    * inequality. The weight column rides through [[bucketize]] as a
    * passthrough (groupCols carry any extra columns). Integer weights keep
    * the whole sketch integer-exact and oracle-certifiable; the exact
    * weighted rank-q statistic provably lands in the picked bucket (same
    * first-crossing argument as the unweighted proof in HdrSketchSpec).
    */
  def weightedCounts(bucketized: DataFrame, weight: Column, groupCols: Column*): DataFrame =
    bucketized
      .groupBy(groupCols :+ col("bucket") :+ col("lo") :+ col("hi"): _*)
      .agg(sum(weight).as("cnt"))

  /** Quantile spec rows (label, num, den): rank threshold is
    * ceil(n*num/den), applied as the all-integer `cum*den >= n*num`.
    */
  def quantileSpec(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // a LocalRelation (literal table), so plan guards can prove the
    // broadcast side of the estimates() cross join is bounded
    Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))
      .toDF("q_label", "num", "den")
  }

  /** Even k-way split spec (q1 = 1/parts … q(parts-1)): the boundary set
    * an equi-depth range partitioner needs. Same (label, num, den) shape
    * as [[quantileSpec]], same all-integer rank test downstream.
    */
  def splitSpec(df: DataFrame, parts: Int): DataFrame = {
    require(parts >= 2 && parts <= 1024, s"parts must be in [2,1024], got $parts")
    val s = df.sparkSession
    import s.implicits._
    (1 until parts).map(j => (s"q$j", j.toLong, parts.toLong))
      .toDF("q_label", "num", "den")
  }

  /** p50/p90/p99 bounds from a counts() snapshot: cumulative-sum the
    * BUCKET-level rows (bounded: <= ~2k per group at any corpus size),
    * broadcast the 3-row spec, pick each quantile's first crossing bucket.
    * Output: group cols + (q_label, num, den, est_lo, est_hi, n_group).
    */
  def estimates(counts: DataFrame, groupCols: Column*): DataFrame =
    estimatesWith(counts, quantileSpec(counts), groupCols: _*)

  /** [[estimates]] with a caller-provided quantile spec (e.g.
    * [[splitSpec]] for equi-depth partition boundaries).
    */
  def estimatesWith(counts: DataFrame, spec: DataFrame,
      groupCols: Column*): DataFrame = {
    val names = groupCols.map(c => counts.select(c).columns.head)
    val w = Window.partitionBy(groupCols: _*).orderBy(col("bucket"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_group", sum(col("cnt")).over(
        Window.partitionBy(groupCols: _*)))
    cum
      .crossJoin(broadcast(spec))
      .filter(col("cum") * col("den") >= col("n_group") * col("num"))
      .groupBy(names.map(col) :+ col("q_label") :+ col("num") :+
        col("den") :+ col("n_group"): _*)
      .agg(min(col("lo")).as("est_lo"), min(col("hi")).as("est_hi"))
      .select(names.map(col) :+ col("q_label") :+ col("num") :+ col("den") :+
        col("est_lo") :+ col("est_hi") :+ col("n_group"): _*)
  }
}
