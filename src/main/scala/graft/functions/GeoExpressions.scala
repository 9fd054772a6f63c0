package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType}

/** Spatial primitives as native codegen'd Catalyst expressions.
  *
  * The reference's domain is GIS ETL (ArcGIS feature layers, GeoJSON CoT
  * events — `/root/reference/task.ts:192-219` reprojects per vertex), but its
  * per-feature Node loop has no bulk spatial operators at all. At 100 TB a
  * feature corpus needs three spatial primitives the engine can run inside
  * whole-stage codegen, with no UDF boundary:
  *
  *   - [[ZOrderCurve]]: Morton/Z-order bit interleave, the standard
  *     space-filling-curve clustering key (sort feature files by z-value →
  *     parquet row-group min/max bounds become tight 2-D bounding boxes →
  *     bbox queries prune most row groups at the scan).
  *   - [[PointInConvexPolygon]]: exact containment test against a convex
  *     ring (sign-of-cross-product on every edge), the polygon analog of the
  *     reference's server-side spatial filters.
  *   - grid binning (plain arithmetic, [[graft.ops.SpatialJoin]]): turns a
  *     point-in-box spatial join into an equi-join Catalyst can shuffle/
  *     broadcast like any relational join.
  */
object GeoExpressions {

  /** 32-bit × 32-bit Morton interleave → 64-bit z-value (x in even bits,
    * y in odd bits). Magic-mask bit spreading — O(1), branch-free, inlined
    * verbatim by codegen.
    */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def zorder(x: Column, y: Column): Column =
    GraftShims.column(ZOrderCurve.cast(GraftShims.expression(x), GraftShims.expression(y)))

  def pointInConvexPolygon(px: Column, py: Column, xs: Column, ys: Column): Column =
    GraftShims.column(PointInConvexPolygon(
      GraftShims.expression(px), GraftShims.expression(py),
      GraftShims.expression(xs), GraftShims.expression(ys)))
}

/** Z-order (Morton) curve value of a non-negative integer grid cell.
  * Inputs are LongType (lower 32 bits used); output LongType. Sorting rows
  * by this value clusters 2-D-near rows near each other in the file order —
  * the mechanism behind z-order table clustering in large lakehouse tables.
  */
case class ZOrderCurve(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GeoExpressions.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.GeoExpressions.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderCurve =
    copy(left = l, right = r)
  override def prettyName: String = "zorder"
}

object ZOrderCurve {
  def cast(x: Expression, y: Expression): ZOrderCurve = {
    def lng(e: Expression) = if (e.dataType == LongType) e else Cast(e, LongType)
    ZOrderCurve(lng(x), lng(y))
  }
}

/** True iff point (px, py) lies inside or on the boundary of the CONVEX
  * polygon whose ring is (xs(i), ys(i)) — either winding order. Test: the
  * cross product (v2-v1) × (p-v1) keeps one sign over all edges.
  *
  * Convex-only by design: the convex test is exact with no epsilon and no
  * even-odd boundary ambiguity, and integer-coordinate rings make it
  * integer-exact (the form the oracle reproduces). Concave rings are handled
  * one level up by convex decomposition. Codegen emits a tight loop over the
  * ring arrays with zero allocation and no UDF boundary.
  */
case class PointInConvexPolygon(
    first: Expression,
    second: Expression,
    third: Expression,
    fourth: Expression
) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(px: Any, py: Any, xs: Any, ys: Any): Any = {
    val xa = xs.asInstanceOf[ArrayData]
    val ya = ys.asInstanceOf[ArrayData]
    PointInConvexPolygon.contains(
      px.asInstanceOf[Double], py.asInstanceOf[Double], xa, ya)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, xs, ys) =>
      s"graft.functions.PointInConvexPolygon.contains($px, $py, $xs, $ys)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PointInConvexPolygon =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "point_in_convex_polygon"
}

object PointInConvexPolygon {
  /** Shared by interpreted eval and codegen (called verbatim from generated
    * Java): one pass over the ring, no allocation.
    */
  def contains(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = xs.numElements()
    if (n < 3 || ys.numElements() != n) return false
    var allNonNeg = true
    var allNonPos = true
    var i = 0
    while (i < n && (allNonNeg || allNonPos)) {
      val j = if (i + 1 == n) 0 else i + 1
      val x1 = xs.getDouble(i); val y1 = ys.getDouble(i)
      val x2 = xs.getDouble(j); val y2 = ys.getDouble(j)
      val cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
      if (cross < 0) allNonNeg = false
      if (cross > 0) allNonPos = false
      i += 1
    }
    allNonNeg || allNonPos
  }
}
