package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON FeatureCollection as a file format for the canonical Feature
  * frame — the read side of the reference's data interchange (its sink
  * submits FeatureCollections, `/root/reference/task.ts:420-423`; its CoT
  * inputs are GeoJSON features, `task.ts:172-175`).
  *
  * The interesting problem is the RAGGED coordinates column: Point is
  * `[x,y]`, LineString `[[x,y]…]`, Polygon `[[[x,y]…]…]`, MultiPolygon one
  * deeper — one JSON field, four incompatible Catalyst types. Schema
  * inference would collapse it to strings or conflict; instead the reader
  * declares `geometry` as StringType (the JSON source preserves the raw
  * object text for string-typed fields), then parses `coordinates` per
  * geometry kind into the per-kind struct encoding of [[graft.Geometry]]
  * (SURVEY.md §1.4) — exactly one of point/lines/rings/polys non-null.
  * Everything stays Catalyst-native (`get_json_object` + `from_json`):
  * codegen-friendly, no UDF, and a malformed geometry yields nulls instead
  * of failing the scan (T8 isolation).
  */
object GeoJson {

  private val fileSchema = StructType(Seq(
    StructField("features", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", StringType)
    ))))
  ))

  /** Read GeoJSON FeatureCollection files into the canonical Feature frame
    * (`id`, `properties`, per-kind `geometry` struct). One collection per
    * file (`multiLine`); N files scan as N partitions.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fc = spark.read.option("multiLine", true).schema(fileSchema).json(path)
    val f = fc.select(explode(col("features")).as("f"))
    val gtype = get_json_object(col("f.geometry"), "$.type")
    val coords = get_json_object(col("f.geometry"), "$.coordinates")
    f.select(
      col("f.id").as("id"),
      col("f.properties").as("properties"),
      struct(
        gtype.as("gtype"),
        when(gtype === "Point",
          from_json(coords, ArrayType(DoubleType))).as("point"),
        when(gtype.isin("LineString", "MultiPoint"),
          from_json(coords, ArrayType(ArrayType(DoubleType)))).as("lines"),
        when(gtype.isin("Polygon", "MultiLineString"),
          from_json(coords, ArrayType(ArrayType(ArrayType(DoubleType))))).as("rings"),
        when(gtype === "MultiPolygon",
          from_json(coords, ArrayType(ArrayType(ArrayType(ArrayType(DoubleType)))))).as("polys")
      ).as("geometry")
    )
  }

  /** One GeoJSON feature text per row from the canonical frame — the
    * serializer behind the S7 sink, covering EVERY geometry kind (the
    * coordinates JSON comes from whichever per-kind representation is
    * non-null, so the ragged nesting renders correctly without a UDF).
    */
  def featureJson: Column = {
    val base = to_json(struct(
      col("id"), lit("Feature").as("type"), col("properties")))
    val coords = coalesce(
      to_json(col("geometry.point")),
      to_json(col("geometry.lines")),
      to_json(col("geometry.rings")),
      to_json(col("geometry.polys")))
    val geo = concat(
      lit("""{"type":""""), col("geometry.gtype"),
      lit("""","coordinates":"""), coords, lit("}"))
    // splice the geometry into the struct JSON before its closing brace
    concat(base.substr(lit(1), length(base) - 1), lit(""","geometry":"""), geo, lit("}"))
  }

  /** Render a whole partition-worth of features as one FeatureCollection
    * document (what a TAK submit batch carries).
    */
  def featureCollectionJson(features: Seq[String]): String =
    features.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
}
