package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode–Muthukrishnan 2005) — the mergeable,
  * bounded-state production path for POINT-FREQUENCY queries over an
  * unbounded key space (token counts, n-gram counts, entity mentions),
  * completing the sketch suite beside quantiles ([[HdrSketch]]), distinct
  * counts (KMV, `x3`), top-k heavy hitters (Misra–Gries, `x22`) and
  * samples (`p22`).
  *
  * Structure: `depth` independent hash rows of `width` counters. A key
  * with hash `h` uniform on [0, P) increments one counter per row at
  * `bucket_i = ((a_i·h + b_i) mod P) mod width`; its frequency estimate is
  * the MINIMUM of its `depth` counters. The estimate NEVER underestimates
  * (every counter the key touches holds its true count plus non-negative
  * collision mass — the deterministic one-sided guarantee
  * `t27_cms_certify` checks key by key) and overestimates by more than
  * ε·N only with probability δ, with ε = e/width and δ = e^−depth over
  * the hash draw.
  *
  * Spark shape: the sketch is ONE `groupBy(row_i, bucket).count()` —
  * map-side partial aggregation collapses every mapper to ≤ depth·width
  * rows before the exchange, so the shuffle is O(depth·width) at ANY
  * corpus size (the same bounded-exchange story as [[HdrSketch]]), it
  * merges across partitions / days / corpora by adding cell counts, and
  * as a streaming aggregation its state is ≤ depth·width rows FOREVER
  * ([[graft.streaming.StreamingCmsFrequency]]). Probing broadcasts the
  * ≤ depth·width-cell sketch against the (bounded) probe-key set — no
  * corpus-sized side ever moves for a point query.
  *
  * All arithmetic is integer (affine hashes mod P, mod width, counts), so
  * DuckDB reproduces every cell and estimate bit-for-bit and the driver
  * hash-certifies the sketch — the same cross-engine-exactness policy as
  * the rest of the suite (HLL/CountSketch internals are engine-private
  * and could never be driver-green).
  */
object CmsSketch {

  /** Hash grid modulus (the corpus-wide convention). */
  val P = 1000000007L

  /** Default depth (hash rows): overestimate-bound failure probability
    * e^−4 ≈ 1.8%.
    */
  val DefaultDepth = 4

  /** Default width (counters per row): ε = e/512 ≈ 0.5% of the stream
    * length; 4×512 = 2,048 cells total.
    */
  val DefaultWidth = 512

  /** Fixed per-row affine-hash coefficients (any fixed odd constants
    * < P work; pairwise independence comes from the affine family).
    */
  val RowA: Seq[Long] = Seq(97L, 1031L, 32749L, 524287L, 8388617L, 536870923L)
  val RowB: Seq[Long] = Seq(17L, 29L, 4099L, 65537L, 131101L, 262147L)

  /** SQL literal rows for a DuckDB oracle's hash-spec CTE:
    * `(VALUES (0,97,17),…) AS v(row_i, a, b)`.
    */
  def rowSpecSql(depth: Int = DefaultDepth): String = {
    require(depth >= 1 && depth <= RowA.size, s"depth must be in [1, ${RowA.size}]")
    (0 until depth).map(i => s"(${i}, ${RowA(i)}, ${RowB(i)})").mkString(", ")
  }

  /** `(row_i, bucket)` pairs for a hash column `h` on [0, P): one struct
    * per hash row, pure per-row integer projections (codegen'd).
    */
  def bucketCols(h: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column = {
    require(depth >= 1 && depth <= RowA.size, s"depth must be in [1, ${RowA.size}]")
    require(width >= 2, "width must be >= 2")
    array((0 until depth).map { i =>
      struct(
        lit(i).as("row_i"),
        (((lit(RowA(i)) * h + lit(RowB(i))) % lit(P)) % lit(width.toLong)).as("bucket"))
    }: _*)
  }

  /** DYNAMIC-width variant: `width` is a runtime COLUMN (the d29/s22
    * adaptive-key-space pattern — derive it in-plan from a broadcast
    * count so the sketch never needs a human retune as cardinality
    * grows). Used by the join-size estimator, whose error ε·|A|·|B| must
    * shrink with the KEY cardinality: width ≈ 4×(distinct keys) keeps
    * the collision mass a bounded fraction of the true inner product.
    * The caller clamps/derives `width`; cells stay O(depth·width).
    */
  def bucketizeDyn(df: DataFrame, h: Column, width: Column,
      groupCols: Column*): DataFrame =
    bucketizeDynD(df, h, width, DefaultDepth, groupCols: _*)

  def bucketizeDynD(df: DataFrame, h: Column, width: Column,
      depth: Int, groupCols: Column*): DataFrame = {
    require(depth >= 1 && depth <= RowA.size, s"depth must be in [1, ${RowA.size}]")
    val cells = array((0 until depth).map { i =>
      struct(
        lit(i).as("row_i"),
        (((lit(RowA(i)) * h + lit(RowB(i))) % lit(P)) % width).as("bucket"))
    }: _*)
    explodeCells(df, cells, groupCols)
  }

  /** Rows with a hash column → exploded (groupCols…, row_i, bucket) —
    * `depth` rows per input row, each a pure integer projection.
    */
  def bucketize(df: DataFrame, h: Column, groupCols: Column*): DataFrame =
    bucketizeDw(df, h, DefaultDepth, DefaultWidth, groupCols: _*)

  def bucketizeDw(df: DataFrame, h: Column, depth: Int,
      width: Int, groupCols: Column*): DataFrame =
    explodeCells(df, bucketCols(h, depth, width), groupCols)

  /** Shared tail of the bucketizers: materialize groupCols + the exploded
    * cell struct in ONE select, then unpack by OUTPUT NAME — group
    * columns may be expressions (e.g. `window(ts).as("w")` in the
    * streaming twins), which must not be re-evaluated against the
    * post-explode frame.
    */
  private def explodeCells(df: DataFrame, cells: Column,
      groupCols: Seq[Column]): DataFrame = {
    val tmp = df.select(groupCols :+ explode(cells).as("rb"): _*)
    val names = tmp.columns.dropRight(1)
    tmp.select(names.map(col) :+ col("rb.row_i").as("row_i") :+
      col("rb.bucket").as("bucket"): _*)
  }

  /** The sketch itself: per (group…, row_i, bucket) counts. Works
    * identically as a batch aggregate and as a streaming aggregation
    * (state = one count per live cell, ≤ depth·width per group).
    */
  def counts(bucketized: DataFrame, groupCols: Column*): DataFrame =
    bucketized
      .groupBy(groupCols :+ col("row_i") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimates for a probe-key frame: each probe key (with
    * its hash `h`) reads its `depth` cells from the broadcast sketch and
    * takes the minimum; a missing cell means NO key ever hashed there, so
    * it reads as 0 (and so does the estimate — unseen keys report 0, not
    * null). Output: keyCols… + `est`.
    */
  def probe(keys: DataFrame, sketch: DataFrame, h: Column,
      keyCols: Column*): DataFrame =
    probeDw(keys, sketch, h, DefaultDepth, DefaultWidth, keyCols: _*)

  def probeDw(keys: DataFrame, sketch: DataFrame, h: Column,
      depth: Int, width: Int, keyCols: Column*): DataFrame =
    bucketizeDw(keys, h, depth, width, keyCols: _*)
      .join(broadcast(sketch), Seq("row_i", "bucket"), "left_outer")
      .groupBy(keyCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
