package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FeatureOps, Merge}
import graft.functions.WebMercator

class FeatureOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def feats = Seq(
    Feature("a", Map("k" -> "v"), Geometry.point(1.0, 2.0)),
    Feature("b", Map.empty, Geometry.multiPoint(Seq(Seq(10.0, 20.0), Seq(30.0, 40.0)))),
    Feature("c", Map("x" -> "1"), Geometry.multiLineString(
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(2.0, 2.0), Seq(3.0, 3.0))))),
    Feature("d", Map.empty, Geometry.multiPolygon(
      Seq(Seq(Seq(Seq(0.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0), Seq(0.0, 0.0))))))
  ).toDF()

  test("T1 id namespace") {
    val out = FeatureOps.idNamespace("9")(feats).select("id").as[String].collect().sorted
    assert(out.toSeq == Seq("layer-9-a", "layer-9-b", "layer-9-c", "layer-9-d"))
  }

  test("T2 metadata nesting wraps properties") {
    val out = FeatureOps.nestMetadata(feats)
    assert(out.schema("properties").dataType.simpleString.startsWith("struct<metadata:map"))
    val m = out.filter(col("id") === "a")
      .select(col("properties.metadata").getItem("k")).as[String].head()
    assert(m == "v")
  }

  test("T3 explode: child ids, Multi strip, property duplication, vertex conservation") {
    val out = FeatureOps.explodeMulti(feats)
    val rows = out.select(col("id"), col("geometry.gtype").as("t")).as[(String, String)]
      .collect().toMap
    assert(rows == Map(
      "a" -> "Point",
      "b-0" -> "Point", "b-1" -> "Point",
      "c-0" -> "LineString", "c-1" -> "LineString",
      "d-0" -> "Polygon"
    ))
    // property duplication (reference copies properties to every child)
    val props = out.filter(col("id") === "c-1")
      .select(col("properties").getItem("x")).as[String].head()
    assert(props == "1")
    // MultiPoint children carry the right coordinates
    val b1 = out.filter(col("id") === "b-1").select(col("geometry.point")).as[Seq[Double]].head()
    assert(b1 == Seq(30.0, 40.0))
    // explode of already-single features is identity
    val again = FeatureOps.explodeMulti(out)
    assert(again.count() == out.count())
  }

  test("P4 null-geometry drop") {
    val withNull = feats.withColumn(
      "geometry",
      when(col("id") === "a", col("geometry"))
    )
    assert(FeatureOps.dropNullGeometry(withNull).count() == 1)
  }

  test("T5 mercator: known values and round-trip") {
    assert(WebMercator.x(0.0) == 0.0)
    assert(math.abs(WebMercator.x(180.0) - 2.003750834e7) < 1e1)
    assert(math.abs(WebMercator.y(0.0)) < 1e-9)
    // round-trip within epsilon across the valid band
    for (lon <- Seq(-179.9, -42.5, 0.0, 13.37, 179.9); lat <- Seq(-84.0, -10.0, 0.0, 45.0, 84.0)) {
      assert(math.abs(WebMercator.invX(WebMercator.x(lon)) - lon) < 1e-9)
      assert(math.abs(WebMercator.invY(WebMercator.y(lat)) - lat) < 1e-9)
    }
  }

  test("T5 mercator expressions run inside codegen plan") {
    val df = spark.range(3).select(
      WebMercator.mercatorX((col("id") * 10).cast("double")).as("mx"),
      WebMercator.mercatorY((col("id") * 10).cast("double")).as("my")
    )
    val rows = df.as[(Double, Double)].collect()
    assert(rows(0)._1 == 0.0 && math.abs(rows(0)._2) < 1e-8)
    assert(math.abs(rows(1)._1 - WebMercator.x(10.0)) == 0.0)
    assert(math.abs(rows(2)._2 - WebMercator.y(20.0)) == 0.0)
    // expression should not force a fallback out of whole-stage codegen:
    // the '*(n)' prefix marks operators fused into a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"mercator not codegen-fused:\n$plan")
  }

  test("T5 reprojectToMercator maps every nesting depth") {
    val out = FeatureOps.reprojectToMercator(feats)
    val pt = out.filter(col("id") === "a").select(col("geometry.point")).as[Seq[Double]].head()
    assert(pt == Seq(WebMercator.x(1.0), WebMercator.y(2.0)))
    val mls = out.filter(col("id") === "c")
      .select(col("geometry.rings")).as[Seq[Seq[Seq[Double]]]].head()
    assert(mls.head.head == Seq(WebMercator.x(0.0), WebMercator.y(0.0)))
    val mp = out.filter(col("id") === "d")
      .select(col("geometry.polys")).as[Seq[Seq[Seq[Seq[Double]]]]].head()
    assert(mp.head.head(1) == Seq(WebMercator.x(0.0), WebMercator.y(1.0)))
  }

  test("T4+T6 ESRI reshape stamps spatialReference and per-kind fields") {
    val out = FeatureOps.toEsriGeometry(feats)
    val a = out.filter(col("id") === "a")
      .select(col("esri_geometry.x"), col("esri_geometry.y"),
        col("esri_geometry.spatialReference.wkid")).head()
    assert(a.getDouble(0) == 1.0 && a.getDouble(1) == 2.0 && a.getInt(2) == 102100)
  }

  test("P3 routing drops unconfigured types") {
    val routed = FeatureOps.routeByGeomType(feats, Seq("Point", "MultiPoint"))
    assert(routed.keySet == Set("Point", "MultiPoint"))
    assert(routed("Point").count() == 1)
    assert(routed("MultiPoint").count() == 1)
  }
}

class MergeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def target = Seq(
    ("k1", "alice", 10.0),
    ("k2", "bob", 20.0)
  ).toDF("key", "name", "bal")

  private def source = Seq(
    ("k2", 99.0),
    ("k3", 7.0)
  ).toDF("key", "bal")

  test("J1 upsert splits into updated/kept/inserted with source-wins semantics") {
    val m = Merge.upsert(target, source, "key")
      .select("key", "name", "bal", "merge_action")
      .as[(String, Option[String], Double, String)]
      .collect().sortBy(_._1)
    assert(m.toSeq == Seq(
      ("k1", Some("alice"), 10.0, "kept"),
      ("k2", Some("bob"), 99.0, "updated"),
      ("k3", None, 7.0, "inserted")
    ))
  }

  test("J1 upsert is idempotent on the key") {
    val once = Merge.upsert(target, source, "key").drop("merge_action")
    val twice = Merge.upsert(once, source, "key").drop("merge_action")
    assert(once.orderBy("key").collect().toSeq == twice.orderBy("key").collect().toSeq)
  }

  test("A2 first-match dedup keeps the ordered-first source row") {
    val dups = Seq(("k", 1, "first"), ("k", 2, "second")).toDF("key", "seq", "v")
    val out = Merge.dedupFirst(dups, "key", Seq("seq")).as[(String, Int, String)].collect()
    assert(out.toSeq == Seq(("k", 1, "first")))
  }

  test("PRESERVE_HISTORY append keeps duplicates") {
    val appended = Merge.append(target, source)
    assert(appended.count() == 4)
    assert(appended.filter(col("key") === "k2").count() == 2)
    // target-only columns null-filled for appended rows
    assert(appended.filter(col("key") === "k3" && col("name").isNull).count() == 1)
  }
}
