package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AMS "tug-of-war" second-moment sketch (Alon–Matias–Szegedy 1996) — the
  * PLANNING sketch for SKEW: F2 = Σ_k f_k² over a key's frequency vector is
  * simultaneously the key's SELF-join output size and the numerator of the
  * skew factor a planner reads to decide whether a shuffle needs salting
  * and how wide — the last pinned knob in the suite (`x1_salted_join`'s
  * `nSalts = 8`) becomes a derived quantity (`x39_ams_salt`).
  *
  * Structure: `rows` independent ±1 sign hashes. Counter i sums
  * `sign_i(h) = 1 − 2·(poly_i(h) mod 2)` over every input ROW (occurrences,
  * not distinct keys), giving Z_i = Σ_k f_k·s_i(k) with E[Z_i²] = F2. The
  * sign family is the parity of a DEGREE-3 polynomial over Z_P
  * (`a·h³ + b·h² + c·h + d mod P`) — the textbook 4-wise-independent
  * construction AMS's variance bound needs. This is not pedantry: the
  * cheaper affine parity (`a·h + b mod P mod 2`, the [[CmsSketch]] row
  * family) UNDERESTIMATED F2 by ~5× on this corpus, because parity of an
  * affine map correlates strongly across the near-consecutive integer keys
  * — the cross terms Σ f_k f_k' E[s_k s_k'] come out systematically
  * negative instead of zero. h² and h³ are computed ONCE per input row
  * (mod P keeps every intermediate < 2^60); the realized error is then
  * MEASURED against exact F2 by the certify rung `x38_ams_f2`, not quoted
  * from theory.
  *
  * Spark shape: signs are pure per-row integer projections (codegen'd),
  * the sketch is ONE `groupBy(row_i).sum(sign)` — map-side combine
  * collapses every partition to ≤ `rows` partial sums before the exchange,
  * so the shuffle is O(rows) at ANY corpus size, sketches MERGE by adding
  * Z_i (union of streams = sum of sketches), and as a streaming aggregation
  * the state is ≤ `rows` longs forever ([[graft.streaming.StreamingAmsF2]]).
  *
  * All arithmetic is integer until the final divisions, which are by
  * powers of two (16, 8) — exact in IEEE doubles — so DuckDB reproduces
  * every Z_i, every group sum, and both estimates bit-for-bit and the
  * driver hash-certifies the sketch (same policy as [[CmsSketch]] /
  * [[HdrSketch]]).
  */
object AmsSketch {

  /** Hash grid modulus (the corpus-wide convention, same as [[CmsSketch.P]]). */
  val P = 1000000007L

  /** Sign-hash rows: 16 = 4 median-of-means groups of 4; mean-estimate
    * relative std ≤ √2/4 ≈ 0.35 over the hash draw (measured ratios on the
    * lineitem orderkey vector: 0.55–1.17 across sf0.001–sf0.1).
    */
  val DefaultRows = 16

  /** Median-of-means group size (4 groups of 4 at the default row count). */
  val GroupSize = 4

  /** Input PRE-MIX coefficients: before the sign rows see it, the caller's
    * hash t is remixed once per input row as
    * h = (M3·t³ + M2·t² + M1·t + M0) mod P. Callers feed affine hashes of
    * near-consecutive keys (orderkeys, user ids), which an affine map
    * preserves structure-for-structure — and a FIXED-coefficient sign
    * family evaluated on a structured key set is ONE correlated draw, not
    * 16 independent ones (measured: per-day windows sharing the same user
    * set all read 0.28–0.97× before the premix, 0.36–1.18× after). The mix
    * costs two extra mod-P multiplies per input row, once, shared by all
    * 16 sign rows.
    */
  val M3 = 40503L
  val M2 = 69069L
  val M1 = 12829L
  val M0 = 1013904223L

  /** The premix as a DuckDB SQL fragment over a column named `t` — oracles
    * interpolate this so the spelling can never drift from the plan's.
    */
  def mixSql(t: String = "t"): String =
    s"($M3*(((($t*$t)%$P)*$t)%$P) + $M2*(($t*$t)%$P) + $M1*$t + $M0) % $P"

  /** Per-row degree-3 coefficients (sign_i = parity of
    * RowA(i)·h³ + RowB(i)·h² + RowC(i)·h + RowD(i) mod P): fixed odd
    * constants < 2^30, so every product against a mod-P value stays
    * < 2^60 and the 4-term sum < 2^63 on both engines.
    */
  val RowA: Seq[Long] = Seq(97L, 131L, 179L, 257L, 521L, 1031L, 2053L, 4099L,
    8209L, 16411L, 32771L, 65537L, 131101L, 262147L, 524309L, 1048583L)
  val RowB: Seq[Long] = Seq(1031L, 2053L, 4099L, 8209L, 16411L, 32771L, 65537L,
    131111L, 262151L, 524341L, 1048589L, 2097211L, 4194329L, 8388619L,
    16777289L, 33554473L)
  val RowC: Seq[Long] = Seq(32749L, 65537L, 131101L, 262147L, 524309L,
    1048583L, 2097169L, 4194319L, 8388617L, 16777259L, 33554467L, 67108879L,
    134217757L, 268435459L, 536870923L, 97L)
  val RowD: Seq[Long] = Seq(17L, 29L, 47L, 61L, 97L, 131L, 257L, 521L,
    1031L, 2053L, 4099L, 8209L, 16411L, 32771L, 65537L, 131L)

  /** SQL literal rows for a DuckDB oracle's hash-spec CTE:
    * `(VALUES (0,97,1031,32749,17),…) AS v(row_i, a, b, c, d)`.
    */
  def rowSpecSql(rows: Int = DefaultRows): String = {
    require(rows >= 1 && rows <= RowA.size, s"rows must be in [1, ${RowA.size}]")
    (0 until rows).map(i =>
      s"(${i}, ${RowA(i)}, ${RowB(i)}, ${RowC(i)}, ${RowD(i)})").mkString(", ")
  }

  /** Rows with a hash column on [0, P) → exploded (groupCols…, row_i,
    * sign) — `rows` ±1 rows per input row. h² and h³ (mod P) are projected
    * ONCE per input row; each sign is then a 4-term integer dot product.
    * The expansion is collapsed by map-side combine inside the same stage,
    * so nothing wider than O(rows) per group ever reaches an exchange.
    */
  def bucketize(df: DataFrame, h: Column, groupCols: Column*): DataFrame =
    bucketizeR(df, h, DefaultRows, groupCols: _*)

  def bucketizeR(df: DataFrame, h: Column, rows: Int, groupCols: Column*): DataFrame = {
    require(rows >= 1 && rows <= RowA.size, s"rows must be in [1, ${RowA.size}]")
    // materialize groupCols + powers in ONE select, then refer by OUTPUT
    // NAME — group columns may be expressions (window(ts)) that must not
    // be re-evaluated against a derived frame
    val pre = df
      .select(groupCols :+ h.as("__t"): _*)
      .withColumn("__t2", (col("__t") * col("__t")) % lit(P))
      .withColumn("__h", (lit(M3) * ((col("__t2") * col("__t")) % lit(P)) +
        lit(M2) * col("__t2") + lit(M1) * col("__t") + lit(M0)) % lit(P))
      .withColumn("__h2", (col("__h") * col("__h")) % lit(P))
      .withColumn("__h3", (col("__h2") * col("__h")) % lit(P))
      .drop("__t", "__t2")
    val cells = array((0 until rows).map { i =>
      struct(
        lit(i).as("row_i"),
        (lit(1L) - lit(2L) * (((lit(RowA(i)) * col("__h3") + lit(RowB(i)) * col("__h2") +
          lit(RowC(i)) * col("__h") + lit(RowD(i))) % lit(P)) % lit(2L))).as("sign"))
    }: _*)
    val names = pre.columns.dropRight(3) // groupCols' output names
    val tmp = pre.select(names.map(col) :+ explode(cells).as("rs"): _*)
    tmp.select(names.map(col) :+ col("rs.row_i").as("row_i") :+
      col("rs.sign").as("sign"): _*)
  }

  /** The sketch itself: Z_i = Σ sign_i per (group…, row_i). Works
    * identically as a batch aggregate and as a streaming aggregation
    * (state = one long per row, ≤ `rows` per group forever); sketches of
    * disjoint shards merge by adding Z_i.
    */
  def sums(bucketized: DataFrame, groupCols: Column*): DataFrame =
    bucketized
      .groupBy(groupCols :+ col("row_i"): _*)
      .agg(sum(col("sign")).as("z"))

  /** F2 estimates from a (group…, row_i, z) sketch frame: `est_mean`
    * (mean of Z_i² over all rows) and `est_mom` (median of the
    * rows/GroupSize group-of-GroupSize means — at the 16-row default, mean
    * of the two middle group sums / 8). The input is ≤ `rows` rows per
    * group, so the collect_list is bounded by construction. Divisions are
    * by powers of two — exact doubles on both engines (GroupSize and the
    * default row count are powers of two; estimateR requires the same of
    * any caller-supplied width).
    */
  def estimate(sums: DataFrame, groupCols: Column*): DataFrame =
    estimateR(sums, DefaultRows, groupCols: _*)

  /** [[estimate]] for a sketch frame built with `bucketizeR(_, _, rows, _)`
    * — `rows` MUST match the bucketize width or the means are mis-scaled
    * (the frame itself doesn't carry it: a group missing from the input of
    * some row_i would make max(row_i)+1 an undercount).
    */
  def estimateR(sums: DataFrame, rows: Int, groupCols: Column*): DataFrame = {
    require(rows >= 1 && rows <= RowA.size, s"rows must be in [1, ${RowA.size}]")
    require(rows % GroupSize == 0,
      s"rows ($rows) must be a multiple of GroupSize ($GroupSize) for median-of-means")
    require((rows & (rows - 1)) == 0,
      s"rows ($rows) must be a power of two so the mean division is IEEE-exact cross-engine")
    val nGroups = rows / GroupSize
    // median of nGroups sorted group sums: even → mean of the two middle,
    // odd → the middle one (nGroups is a power of two ≥ 1, so odd only at 1)
    val (momNum, momDen) =
      if (nGroups % 2 == 0)
        (s"(element_at(__gl, ${nGroups / 2}) + element_at(__gl, ${nGroups / 2 + 1}))",
          2 * GroupSize)
      else
        (s"element_at(__gl, ${(nGroups + 1) / 2})", GroupSize)
    val g = sums
      .groupBy(groupCols :+ expr(s"row_i DIV $GroupSize").as("grp"): _*)
      .agg(sum(col("z") * col("z")).as("gs"))
    g.groupBy(groupCols: _*)
      .agg(sum(col("gs")).as("__ss"), sort_array(collect_list(col("gs"))).as("__gl"))
      .select(groupCols ++ Seq(
        (col("__ss").cast("double") / rows).as("est_mean"),
        (expr(momNum).cast("double") / momDen).as("est_mom"),
        expr(s"$momNum DIV $momDen").as("est_mom_i")): _*)
  }

  /** Derived salt width for a skewed shuffle, as a one-row frame the plan
    * cross-joins (broadcast) wherever the knob is needed — the d29/s22/x35
    * adaptive-rule applied to salting. The skew factor is
    * σ = ceil(F2·parts / n²): under hash partitioning into `parts`
    * reducers, the expected mean-square reducer load is
    * (n/parts)²·(1 + (parts−1)·F2/n²) ≈ (n/parts)²·σ, so σ IS the
    * relative load inflation a skewed key vector inflicts on the shuffle —
    * uniform keys with D ≫ parts give σ → 1 (no salting), a key holding
    * fraction p of the rows gives σ ≥ p²·parts (p = 1 → full `parts`-way
    * spread). σ depends only on the skew SHAPE, not the corpus size, and
    * needs NO distinct-count pass. n_salts = next power of two ≥ σ,
    * clamped to [1, 64]. The ratio is computed as `est/n·parts/n` in
    * doubles — F2·parts and n² would overflow int64 around n ≈ 3×10⁹
    * rows, while each IEEE op here is exactly rounded and therefore
    * bit-identical on both engines at ANY n — and only the final σ is
    * integerized (`ceil`, `len(bin())`, `shiftleft`, all engine-exact).
    *
    * @param estI one-row frame with `est_mom_i` (from [[estimate]])
    * @param stats one-row frame with `n` (row count)
    * @param parts target reducer count (the suite pins
    *              spark.sql.shuffle.partitions = 32)
    */
  def saltWidth(estI: DataFrame, stats: DataFrame, parts: Int = 32): DataFrame =
    estI.crossJoin(broadcast(stats))
      .select(expr(
        s"CASE WHEN CAST(CEIL(CAST(est_mom_i AS DOUBLE) / n * $parts / n) AS BIGINT) <= 1 " +
          "THEN CAST(1 AS BIGINT) " +
          "ELSE least(shiftleft(CAST(1 AS BIGINT), " +
          s"length(bin(CAST(CEIL(CAST(est_mom_i AS DOUBLE) / n * $parts / n) AS BIGINT) - 1))), 64) END")
        .as("__nsalts"))
}
