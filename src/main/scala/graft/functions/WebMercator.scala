package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** EPSG:4326 → EPSG:3857 (Web-Mercator) forward projection, the reference's
  * per-vertex proj4 call (`/root/reference/task.ts:192-219`, pin
  * `package-lock.json:3232-3236`) re-done as native Catalyst expressions
  * with whole-stage codegen — no UDF serialization, stays inside the
  * codegen'd pipeline at any scale.
  *
  * Closed form (spherical, radius R=6378137):
  *   x = R * λ·(π/180)
  *   y = R * ln(tan(π/4 + φ·(π/180)/2))
  *
  * The formulas are written with explicit double literals and parenthesization
  * so the DuckDB oracle can reproduce them operation-for-operation:
  *   x: 6378137.0 * (lon * 0.017453292519943295)
  *   y: 6378137.0 * ln(tan(0.7853981633974483 + (lat * 0.017453292519943295) / 2.0))
  */
object WebMercator {
  final val R = 6378137.0
  final val DegToRad = 0.017453292519943295 // π/180 as an exact double literal
  final val QuarterPi = 0.7853981633974483 // π/4

  def x(lon: Double): Double = R * (lon * DegToRad)
  def y(lat: Double): Double = R * math.log(math.tan(QuarterPi + (lat * DegToRad) / 2.0))

  /** Inverse (3857 → 4326), for round-trip property tests. */
  def invX(mx: Double): Double = mx / R / DegToRad
  def invY(my: Double): Double =
    (2.0 * math.atan(math.exp(my / R)) - 2.0 * QuarterPi) / DegToRad

  import org.apache.spark.sql.GraftShims
  def mercatorX(lon: Column): Column =
    GraftShims.column(MercatorX(GraftShims.expression(lon)))
  def mercatorY(lat: Column): Column =
    GraftShims.column(MercatorY(GraftShims.expression(lat)))
}

/** Input must be DoubleType — construct via [[MercatorX.cast]] (or the
  * Column API) so non-double inputs (e.g. SQL decimal literals) are coerced.
  */
case class MercatorX(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    WebMercator.x(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebMercator.x($c)")
  override protected def withNewChildInternal(c: Expression): MercatorX = copy(child = c)
  override def prettyName: String = "mercator_x"
}

object MercatorX {
  /** Coerce any numeric input to double before projection. */
  def cast(e: Expression): MercatorX =
    MercatorX(if (e.dataType == DoubleType) e else Cast(e, DoubleType))
}

case class MercatorY(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    WebMercator.y(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebMercator.y($c)")
  override protected def withNewChildInternal(c: Expression): MercatorY = copy(child = c)
  override def prettyName: String = "mercator_y"
}

object MercatorY {
  def cast(e: Expression): MercatorY =
    MercatorY(if (e.dataType == DoubleType) e else Cast(e, DoubleType))
}
