package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the approximate-sketch surface. x3 itself now runs
  * a deterministic KMV + grid-median pair (driver-oracled exactly), but the
  * engine still exposes Spark's HLL++/KLL sketches whose internals differ
  * across engines BY DESIGN — their bounds are enforced here, alongside the
  * KMV estimator's own relative-error bound against the exact distinct count.
  */
class SketchBoundsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("KMV k-minimum-values estimate is within the sketch's relative error") {
    import org.apache.spark.sql.Encoders
    val k = 64
    val P = 1000000007L
    val kmv = udaf(new graft.functions.Aggregates.KmvSketch(k), Encoders.scalaLong)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        ((lit(2654435761L) * col("l_partkey") + lit(12345L)) % P).as("h"),
        col("l_partkey"))
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"), kmv(col("h")).as("ret"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val ret = r.getSeq[Long](2)
      val est =
        if (ret.size < k) ret.size.toDouble
        else ((k - 1).toLong * P / ret.last).toDouble
      // KMV rsd ~ 1/sqrt(k-2) ≈ 0.127; allow 3 sigma
      assert(math.abs(est - exact) / exact <= 0.4,
        s"${r.getString(0)}: kmv=$est exact=$exact")
    }
  }

  test("KMV retained set is the k smallest distinct hashes regardless of partitioning") {
    import org.apache.spark.sql.Encoders
    val k = 8
    val kmv = udaf(new graft.functions.Aggregates.KmvSketch(k), Encoders.scalaLong)
    import spark.implicits._
    val data = Seq(5L, 3L, 9L, 3L, 1L, 7L, 5L, 2L, 8L, 6L, 4L, 10L, 1L)
    val expected = data.distinct.sorted.take(k)
    Seq(1, 3, 7).foreach { parts =>
      val got = data.toDF("h").repartition(parts)
        .agg(kmv(col("h")).as("ret")).head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("approx_count_distinct is within the default HLL++ relative error") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // default rsd = 0.05; allow 3 sigma
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx is within rank-error bounds of the exact percentile") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.05)").as("exact_p05"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p95")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      val (p05, p95) = (r.getDouble(3), r.getDouble(4))
      // accuracy 10000 → rank error ~1/10000; being generous, the approx
      // median must at minimum stay far inside the p05..p95 band
      assert(approx >= p05 && approx <= p95, s"approx median $approx outside [$p05, $p95]")
      assert(math.abs(approx - exact) / math.max(exact, 1.0) <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }
}
