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
}
