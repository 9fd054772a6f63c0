package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.arcgis.{EsriFeature, MiniJson}

class MiniJsonSpec extends AnyFunSuite {
  test("parses the ArcGIS REST envelope shapes") {
    val body =
      """{"fields":[{"name":"objectid","type":"esriFieldTypeOID"},{"name":"nm","type":"esriFieldTypeString"}],
        |"maxRecordCount":2000,
        |"features":[{"attributes":{"objectid":7,"nm":"a \"quoted\" name","score":1.5},
        |             "geometry":{"x":-105.5,"y":39.25}}],
        |"addResults":[{"objectId":11,"success":true},{"success":false,"error":{"description":"bad row"}}]}"""
        .stripMargin
    val j = MiniJson.parse(body)
    assert(j.arr("fields").map(_.str("name")) == Seq("objectid", "nm"))
    assert(j.num("maxRecordCount").contains(2000.0))
    val f = j.arr("features").head
    assert(f.obj("attributes").get.num("objectid").contains(7.0))
    assert(f.obj("attributes").get.str("nm") == """a "quoted" name""")
    assert(f.obj("geometry").get.num("x").contains(-105.5))
    val res = j.arr("addResults")
    assert(res.head.bool("success").contains(true) && res.head.num("objectId").contains(11.0))
    assert(res(1).obj("error").get.str("description") == "bad row")
  }

  test("serializes features to ESRI JSON with escaping") {
    val out = MiniJson.featuresJson(Seq(
      EsriFeature(Map("cotuid" -> "u\"1", "n" -> 5L), Some((1.5, -2.5)))
    ))
    assert(out.contains("\"cotuid\":\"u\\\"1\""))
    assert(out.contains("\"n\":5"))
    assert(out.contains("\"geometry\":{\"x\":1.5,\"y\":-2.5"))
    // round-trips through the parser
    val back = MiniJson.parse(out.replaceFirst("\\[", "{\"features\":[").dropRight(1) + "]}")
    assert(back.arr("features").head.obj("attributes").get.str("cotuid") == "u\"1")
  }
}
