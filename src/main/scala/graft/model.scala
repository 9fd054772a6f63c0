package graft

/** Canonical data model for the geospatial feature stream.
  *
  * The reference engine's unit of data is a GeoJSON Feature
  * (`/root/reference/task.ts:420-447`): `{id, type, properties, geometry}`
  * with ragged coordinate nesting (Point = 1 level, LineString/MultiPoint = 2,
  * Polygon/MultiLineString = 3). We keep everything Catalyst-native with a
  * per-kind struct encoding (SURVEY.md §1.4): exactly one of
  * `point`/`lines`/`rings` is non-null for a given geometry type. This avoids
  * a UDT (which defeats codegen and column pruning) while staying lossless.
  */
case class Geometry(
    gtype: String, // "Point" | "LineString" | "Polygon" | "Multi*"
    point: Option[Seq[Double]] = None, // Point [x,y]
    lines: Option[Seq[Seq[Double]]] = None, // LineString / MultiPoint
    rings: Option[Seq[Seq[Seq[Double]]]] = None, // Polygon / MultiLineString
    polys: Option[Seq[Seq[Seq[Seq[Double]]]]] = None // MultiPolygon
)

object Geometry {
  def point(x: Double, y: Double): Geometry =
    Geometry("Point", point = Some(Seq(x, y)))
  def lineString(pts: Seq[Seq[Double]]): Geometry =
    Geometry("LineString", lines = Some(pts))
  def polygon(rings: Seq[Seq[Seq[Double]]]): Geometry =
    Geometry("Polygon", rings = Some(rings))
  def multiPoint(pts: Seq[Seq[Double]]): Geometry =
    Geometry("MultiPoint", lines = Some(pts))
  def multiLineString(ls: Seq[Seq[Seq[Double]]]): Geometry =
    Geometry("MultiLineString", rings = Some(ls))
  def multiPolygon(ps: Seq[Seq[Seq[Seq[Double]]]]): Geometry =
    Geometry("MultiPolygon", polys = Some(ps))
}

/** A feature row as emitted by the incoming scan (reference `task.ts:426`).
  * `properties` is schema-less upstream metadata → MapType escape hatch.
  */
case class Feature(
    id: String,
    properties: Map[String, String],
    geometry: Geometry
)

/** CoT (Team Awareness Kit) feature attributes — the outgoing flow's fixed
  * 8-column projection target (reference `task.ts:243-250`).
  */
case class CotAttributes(
    cotuid: String,
    callsign: String,
    remarks: String,
    cottype: String,
    how: String,
    time: java.sql.Timestamp,
    start: java.sql.Timestamp,
    stale: java.sql.Timestamp
)
