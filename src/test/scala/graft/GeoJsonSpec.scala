package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GeoJson

class GeoJsonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fc =
    """{"type":"FeatureCollection","features":[
      |{"id":"p1","properties":{"name":"station"},"geometry":{"type":"Point","coordinates":[-105.1,39.7]}},
      |{"id":"l1","properties":{"name":"route"},"geometry":{"type":"LineString","coordinates":[[0.0,0.0],[1.0,2.0]]}},
      |{"id":"g1","properties":{"name":"zone"},"geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[4.0,0.0],[4.0,4.0],[0.0,0.0]]]}},
      |{"id":"m1","properties":{"name":"archipelago"},"geometry":{"type":"MultiPolygon","coordinates":[[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]],[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]]}}
      |]}""".stripMargin

  test("reads ragged geometry kinds from a FeatureCollection into the per-kind struct") {
    val dir = Files.createTempDirectory("geojson")
    Files.write(Paths.get(dir.toString, "fc.json"), fc.getBytes(StandardCharsets.UTF_8))
    val df = GeoJson.read(spark, dir.toString)
    assert(df.count() == 4)

    val byId = df.collect().map(r => r.getString(0) -> r).toMap
    val p = byId("p1").getStruct(2)
    assert(p.getString(0) == "Point")
    assert(p.getSeq[Double](1) == Seq(-105.1, 39.7))
    val l = byId("l1").getStruct(2)
    assert(l.getString(0) == "LineString" && l.isNullAt(1))
    assert(l.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq).toSeq ==
      Seq(Seq(0.0, 0.0), Seq(1.0, 2.0)))
    val g = byId("g1").getStruct(2)
    assert(g.getString(0) == "Polygon" && !g.isNullAt(3))
    val m = byId("m1").getStruct(2)
    assert(m.getString(0) == "MultiPolygon" && !m.isNullAt(4))
    // exactly one representation non-null per row
    assert(df.filter(
      (col("geometry.point").isNotNull.cast("int") +
        col("geometry.lines").isNotNull.cast("int") +
        col("geometry.rings").isNotNull.cast("int") +
        col("geometry.polys").isNotNull.cast("int")) =!= 1).count() == 0)
    // properties survive as the schema-less map
    assert(byId("p1").getMap[String, String](1)("name") == "station")
  }

  test("serializer round-trips every geometry kind through a written collection") {
    val dir = Files.createTempDirectory("geojson_rt")
    Files.write(Paths.get(dir.toString, "fc.json"), fc.getBytes(StandardCharsets.UTF_8))
    val original = GeoJson.read(spark, dir.toString)

    // features → per-row JSON → one FeatureCollection doc → read back
    val rendered = original.select(GeoJson.featureJson.as("j"))
      .collect().map(_.getString(0)).sorted
    val doc = GeoJson.featureCollectionJson(rendered.toIndexedSeq)
    val dir2 = Files.createTempDirectory("geojson_rt2")
    Files.write(Paths.get(dir2.toString, "fc.json"), doc.getBytes(StandardCharsets.UTF_8))
    val reread = GeoJson.read(spark, dir2.toString)

    val a = original.orderBy("id").collect().map(_.toString).toSeq
    val b = reread.orderBy("id").collect().map(_.toString).toSeq
    assert(a == b, s"round-trip drift:\n${a.zip(b).filter(p => p._1 != p._2).take(2)}")
  }
}
