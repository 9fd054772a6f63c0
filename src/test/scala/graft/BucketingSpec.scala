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
}
