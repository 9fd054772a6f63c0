package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SketchPartitioner

/** Contracts for the sketch-guided equi-depth repartitioner (the operator
  * form of x37's planning pass): balance, determinism, range locality.
  */
class SketchPartitionerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def cents =
    Tables.lineitem(spark, sf)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v"))

  test("partitionByValue yields `parts` partitions balanced within sketch granularity") {
    val parts = 8
    val out = SketchPartitioner.partitionByValue(cents, col("v"), parts)
    val sizes = out.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.size == parts, s"expected $parts non-empty partitions, got ${sizes.keySet}")
    val n = sizes.values.sum
    val ideal = n.toDouble / parts
    // equi-depth up to bucket-width granularity: the heaviest bin can
    // overshoot the ideal share only by the mass of one boundary bucket;
    // 40% head-room is far above the 3.1% width at the observed scale
    sizes.foreach { case (pid, c) =>
      assert(c >= ideal * 0.6 && c <= ideal * 1.4,
        s"partition $pid holds $c rows vs ideal $ideal")
    }
  }

  test("each output partition holds ONE contiguous value range (range locality)") {
    val out = SketchPartitioner.partitionByValue(cents, col("v"), 8)
    val spans = out.withColumn("pid", spark_partition_id())
      .groupBy(col("pid"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // sorted by lo, every partition's range must end before the next begins
    spans.zip(spans.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping partition ranges: hi=$hi >= next lo=$lo2")
    }
  }

  test("bin assignment is deterministic (pure aggregate, no sampling of data values)") {
    val a = SketchPartitioner.binOf(cents, col("v"), 8)
      .groupBy(col("__bin")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SketchPartitioner.binOf(cents, col("v"), 8)
      .groupBy(col("__bin")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.keySet == (1L to 8L).toSet)
  }

  test("binOf agrees with the oracled x37 report") {
    val fromOp = SketchPartitioner.binOf(cents, col("v"), 8)
      .groupBy(col("__bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val x37 = SparkEntry.queries("x37_sketch_partition")(spark, sf)
      .select(col("bin"), col("n_rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromOp == x37)
  }
}
