package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-binned spatial join: points → containing boxes, as a pure equi-join.
  *
  * The naive spatial join is a cartesian product with a range predicate —
  * Catalyst plans it as BroadcastNestedLoopJoin, O(|P|·|B|), which is fatal
  * when neither side is tiny. The standard scale fix (PBSM / grid
  * partitioning) maps BOTH sides onto a fixed grid so the planner sees a
  * plain equi-join on the cell key:
  *
  *   - a point lands in exactly ONE cell: (⌊x/g⌋, ⌊y/g⌋)
  *   - a box is replicated to EVERY cell its extent overlaps (a compact
  *     `sequence` × `sequence` explode — replication factor ≈ box area /
  *     cell area)
  *   - equi-join on the cell key (hash shuffle or broadcast, Catalyst's
  *     choice from stats/AQE), then the exact containment predicate filters
  *     the candidates within each cell.
  *
  * Because the point side is never replicated, a (point, box) pair can meet
  * in at most one cell — the one containing the point — so the output needs
  * NO dedup (no distinct, no extra shuffle).
  *
  * At 100 TB: the shuffle is keyed by grid cell, so spatial skew (a city's
  * worth of points in one cell) is ordinary join-key skew — AQE's skew-join
  * split handles it; `cellSize` trades box replication (smaller cells →
  * more copies of each box) against candidate selectivity (larger cells →
  * more false candidates for the residual filter). Boxes whose extent is
  * huge relative to `cellSize` belong on the broadcast side.
  *
  * Reference analog: the server-side `geometry` envelope filter of the
  * ArcGIS query API (`/root/reference/` query layer pagination) — here run
  * engine-side over arbitrarily many envelopes at once.
  *
  * @param points any columns + (`x`, `y`) point coordinates (double)
  * @param boxes  any columns + (`xmin`, `ymin`, `xmax`, `ymax`) envelopes
  * @param cellSize grid pitch in coordinate units
  * @return one row per (point, box) containment pair (boundary inclusive),
  *         carrying all columns of both inputs
  */
object SpatialJoin {
  def pointsInBoxes(points: DataFrame, boxes: DataFrame, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val g = lit(cellSize)
    val p = points
      .withColumn("__sj_cx", floor(col("x") / g).cast("long"))
      .withColumn("__sj_cy", floor(col("y") / g).cast("long"))
    val b = boxes
      .withColumn("__sj_cx",
        explode(sequence(floor(col("xmin") / g).cast("long"), floor(col("xmax") / g).cast("long"))))
      .withColumn("__sj_cy",
        explode(sequence(floor(col("ymin") / g).cast("long"), floor(col("ymax") / g).cast("long"))))
    p.join(b, Seq("__sj_cx", "__sj_cy"))
      .filter(
        col("x") >= col("xmin") && col("x") <= col("xmax") &&
          col("y") >= col("ymin") && col("y") <= col("ymax"))
      .drop("__sj_cx", "__sj_cy")
  }

  /** Grid-blocked k-nearest-neighbors: for each query point, the `k`
    * nearest data points among those in the query's 3×3 neighbor cells,
    * by squared Euclidean distance (exact when coordinates are integral —
    * no sqrt, no transcendental).
    *
    * Blocking is the same PBSM trick as [[pointsInBoxes]] flipped around:
    * the QUERY side replicates ×9 (its cell plus the 8 neighbors), the data
    * side lands in exactly one cell, so every (query, point) pair meets at
    * most once and the candidate join is a plain equi-join on the cell key
    * — never O(|Q|·|P|). The final rank is a window per query key: query
    * cardinality scales with the data, so parallelism does too.
    *
    * The 3×3 neighborhood is the candidate scope, not a heuristic that can
    * silently miss: callers choose `cellSize` ≥ the search radius they care
    * about (a point farther than one cell is farther than `cellSize`).
    *
    * @param queries any columns + (`qx`, `qy`); `keyCol` must uniquely key a query
    * @param points  any columns + (`x`, `y`)
    * @param tie     deterministic tiebreak among equal distances (a unique
    *                point id), so ranks are engine-reproducible
    * @return query ∪ point columns + `dist2` + `rn` (1..k per query)
    */
  def knnInGrid(
      queries: DataFrame,
      points: DataFrame,
      cellSize: Double,
      k: Int,
      keyCol: String,
      tie: org.apache.spark.sql.Column): DataFrame = {
    require(cellSize > 0 && k > 0, "cellSize and k must be positive")
    val g = lit(cellSize)
    val p = points
      .withColumn("__sj_cx", floor(col("x") / g).cast("long"))
      .withColumn("__sj_cy", floor(col("y") / g).cast("long"))
    val q = queries
      .withColumn("__sj_dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__sj_dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__sj_cx", floor(col("qx") / g).cast("long") + col("__sj_dx"))
      .withColumn("__sj_cy", floor(col("qy") / g).cast("long") + col("__sj_dy"))
      .drop("__sj_dx", "__sj_dy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("dist2"), tie)
    q.join(p, Seq("__sj_cx", "__sj_cy"))
      .withColumn("dist2",
        (col("qx") - col("x")) * (col("qx") - col("x")) +
          (col("qy") - col("y")) * (col("qy") - col("y")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("__sj_cx", "__sj_cy")
  }

  /** [[knnInGrid]] with the cell size chosen IN-PLAN from measured density:
    *
    *   cell = clamp[1, 64]( ⌊ √(domainArea · targetPerCell / N) ⌋ ),  N = |points|
    *
    * Per-cell occupancy then stays ≈ `targetPerCell` as the corpus grows, so
    * candidate volume is ≈ 9·targetPerCell·|Q| — linear in the data — where a
    * FIXED cell size degrades quadratically with density (measured: g6 pays
    * 13× wall for 10× rows at sf1 on the fixed 360×170 domain; SCALING.md
    * names this exact lever). The count enters as a broadcast single-row
    * aggregate — no eager driver action at construction — and both join
    * sides derive the identical cell from it. `floor(sqrt(·))` on IEEE
    * doubles is engine-reproducible, so a SQL oracle recomputes the same
    * cell from the same formula. The clamp bounds both extremes: an empty
    * or tiny corpus gets the 64-unit cell (floor of ∞ saturates, no NaN),
    * an enormous one never shrinks below 1 unit.
    *
    * The neighborhood semantics follow the cell: results are the k nearest
    * WITHIN the adaptive 3×3 neighborhood (≈ the current density's natural
    * search radius), which is the production contract for grid kNN — a
    * radius that ignored density would either miss neighbors or go
    * quadratic.
    */
  def knnInGridAdaptive(
      queries: DataFrame,
      points: DataFrame,
      domainArea: Double,
      targetPerCell: Int,
      k: Int,
      keyCol: String,
      tie: org.apache.spark.sql.Column): DataFrame = {
    require(domainArea > 0 && targetPerCell > 0 && k > 0,
      "domainArea, targetPerCell and k must be positive")
    val stats = points.agg(count(lit(1)).as("__sj_n"))
    val cell = least(lit(64.0), greatest(lit(1.0),
      floor(sqrt(lit(domainArea) * targetPerCell / col("__sj_n")))))
    val p = points.crossJoin(broadcast(stats))
      .withColumn("__sj_cell", cell)
      .withColumn("__sj_cx", floor(col("x") / col("__sj_cell")).cast("long"))
      .withColumn("__sj_cy", floor(col("y") / col("__sj_cell")).cast("long"))
      .drop("__sj_n", "__sj_cell")
    val q = queries.crossJoin(broadcast(stats))
      .withColumn("__sj_cell", cell)
      .withColumn("__sj_dx", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__sj_dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("__sj_cx", floor(col("qx") / col("__sj_cell")).cast("long") + col("__sj_dx"))
      .withColumn("__sj_cy", floor(col("qy") / col("__sj_cell")).cast("long") + col("__sj_dy"))
      .drop("__sj_dx", "__sj_dy", "__sj_n", "__sj_cell")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("dist2"), tie)
    q.join(p, Seq("__sj_cx", "__sj_cy"))
      .withColumn("dist2",
        (col("qx") - col("x")) * (col("qx") - col("x")) +
          (col("qy") - col("y")) * (col("qy") - col("y")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .drop("__sj_cx", "__sj_cy")
  }
}
