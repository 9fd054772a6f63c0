package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoExpressions, PointInConvexPolygon, ZOrderCurve}
import graft.ops.SpatialJoin

class GeoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // naive bit-loop reference for the Morton interleave
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorder: known values, interpreted eval, and random cross-check") {
    assert(GeoExpressions.interleave(0, 0) == 0L)
    assert(GeoExpressions.interleave(1, 0) == 1L)
    assert(GeoExpressions.interleave(0, 1) == 2L)
    assert(GeoExpressions.interleave(3, 5) == 39L) // 0b100111
    // interpreted (non-codegen) path
    assert(ZOrderCurve(Literal(3L), Literal(5L)).eval(null) == 39L)
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val x = rnd.nextInt(Int.MaxValue).toLong
      val y = rnd.nextInt(Int.MaxValue).toLong
      assert(GeoExpressions.interleave(x, y) == mortonRef(x, y))
    }
  }

  test("zorder: codegen path over a DataFrame matches the reference loop") {
    val df = (0 until 1000).map(i => (i.toLong * 7919 % 1024, i.toLong * 104729 % 1024))
      .toDF("x", "y")
    val got = df.select($"x", $"y", GeoExpressions.zorder($"x", $"y").as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1))))
  }

  test("zorder locality: points of one 32x32 tile share the high bits") {
    // all points with x,y in [64, 96) interleave into one contiguous z range
    val zs = for (x <- 64L until 96L; y <- 64L until 96L)
      yield GeoExpressions.interleave(x, y)
    assert(zs.min == GeoExpressions.interleave(64, 64))
    assert(zs.max == GeoExpressions.interleave(95, 95))
    assert(zs.max - zs.min == 1023) // 32*32 tile occupies exactly 2^10 z slots
  }

  test("point-in-convex-polygon: square containment incl. boundary, both windings") {
    def inSquare(px: Double, py: Double, ccw: Boolean): Boolean = {
      val ring = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
      val r = if (ccw) ring else ring.reverse
      val df = Seq((px, py)).toDF("px", "py")
        .withColumn("xs", array(r.map(v => lit(v._1)): _*))
        .withColumn("ys", array(r.map(v => lit(v._2)): _*))
      df.select(GeoExpressions.pointInConvexPolygon($"px", $"py", $"xs", $"ys"))
        .head().getBoolean(0)
    }
    for (ccw <- Seq(true, false)) {
      assert(inSquare(2, 2, ccw))
      assert(inSquare(0, 2, ccw)) // edge
      assert(inSquare(0, 0, ccw)) // vertex
      assert(!inSquare(5, 2, ccw))
      assert(!inSquare(-0.001, 2, ccw))
    }
  }

  test("point-in-convex-polygon: degenerate rings are false, interpreted eval agrees") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def lit2(a: Seq[Double]) = Literal.create(ArrayData.toArrayData(a.toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    // fewer than 3 vertices
    assert(PointInConvexPolygon(Literal(1.0), Literal(1.0),
      lit2(Seq(0.0, 2.0)), lit2(Seq(0.0, 2.0))).eval(null) == false)
    // interpreted path on the square
    assert(PointInConvexPolygon(Literal(2.0), Literal(2.0),
      lit2(Seq(0.0, 4.0, 4.0, 0.0)), lit2(Seq(0.0, 0.0, 4.0, 4.0))).eval(null) == true)
  }

  test("grid spatial join: differential vs brute-force, and no cartesian in the plan") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 400)
      .map(i => (i.toLong, rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100))
      .toDF("pid", "x", "y")
    val boxes = (1 to 30).map { i =>
      val xmin = rnd.nextDouble() * 180 - 100
      val ymin = rnd.nextDouble() * 180 - 100
      (i.toLong, xmin, ymin, xmin + rnd.nextDouble() * 40, ymin + rnd.nextDouble() * 40)
    }.toDF("bid", "xmin", "ymin", "xmax", "ymax")

    val grid = SpatialJoin.pointsInBoxes(points, boxes, cellSize = 25.0)
      .select("pid", "bid").as[(Long, Long)].collect().toSeq
    val brute = points.crossJoin(boxes)
      .filter($"x" >= $"xmin" && $"x" <= $"xmax" && $"y" >= $"ymin" && $"y" <= $"ymax")
      .select("pid", "bid").as[(Long, Long)].collect().toSeq
    assert(grid.size == brute.size, "grid join must emit no duplicate pairs")
    assert(grid.toSet == brute.toSet)
    assert(brute.nonEmpty)

    val plan = SpatialJoin.pointsInBoxes(points, boxes, 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("g1/g2/g3 pack queries run at sf0.001 with expected shapes") {
    val d = "/root/testdata/sf0.001"
    val byName = graft.queries.GeoPack.queries.map(q => q.name -> q).toMap
    val g1 = byName("g1_grid_spatial_join").run(spark, d).collect()
    assert(g1.length == 25) // every nation present, zero-filled
    assert(g1.map(_.getLong(1)).sum > 0)
    val g2 = byName("g2_zorder_cluster").run(spark, d)
    val g2r = g2.collect()
    assert(g2r.nonEmpty)
    // z-bucket spans stay tile-sized: bucket = z >> 10 covers a 32x32 tile
    g2r.foreach { r =>
      assert(r.getLong(4) <= 31 && r.getLong(5) <= 31) // x_span, y_span
    }
    val g3 = byName("g3_point_in_polygon").run(spark, d)
    val g3plan = g3.queryExecution.executedPlan.toString
    assert(g3plan.contains("BroadcastNestedLoopJoin"), "polygon side must broadcast")
    assert(g3.collect().length == 25)
  }
}
