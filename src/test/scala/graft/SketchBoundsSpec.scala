package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x3_approx_sketches is rows-only at the oracle (sketch internals differ
  * across engines BY DESIGN — HLL++ vs DuckDB's HLL, KLL vs t-digest), so
  * its accuracy contract is enforced here instead: each approximate answer
  * must sit within the sketch's documented error bound of the exact answer
  * computed on the same data.
  */
class SketchBoundsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

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
