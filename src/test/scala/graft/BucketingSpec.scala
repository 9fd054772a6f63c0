package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the pre-shuffle strategy for repeated
  * large-large joins at 100 TB (SURVEY.md §4): both sides bucketed on the
  * join key join with NO Exchange in the plan.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed fact-fact join plans without a shuffle") {
    val sf = "/root/testdata/sf0.001"

    Tables.lineitem(spark, sf)
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("ord_b")

    // disable broadcast so the join strategy itself is under test
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an Exchange on either side
      val joinSection = plan.substring(0, plan.length)
      assert(joinSection.contains("SortMergeJoin"), plan)
      val exchangesBeforeAgg = "Exchange hashpartitioning\\(l_orderkey".r.findAllIn(plan).size
      assert(exchangesBeforeAgg == 0, s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      // the P3 routing layout at rest: one directory per geometry/event type
      Tables.events(spark, sf)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)

      val q = spark.read.parquet(dir)
        .filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      // the type predicate must become a PartitionFilter (directory pruning,
      // zero I/O for other types), not a post-scan row filter
      assert(plan.contains("PartitionFilters"), plan)
      val scanLine = plan.linesIterator
        .find(l => l.contains("PartitionFilters") && l.contains("event_type")).getOrElse("")
      assert(scanLine.nonEmpty, plan)

      // pruned scan touches strictly fewer files than the full corpus has
      // (inputFiles ignores partition filters — use the executed scan metric)
      val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
      pruned.collect()
      val allFiles = spark.read.parquet(dir).inputFiles.length
      val scanned = pruned.queryExecution.executedPlan
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
        .head.metrics("numFiles").value
      assert(scanned < allFiles,
        s"expected pruning: query reads $scanned of $allFiles files")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
