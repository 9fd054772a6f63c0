package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the runtime complement to the manual salting
  * utility (`ops/Salting`, oracle-checked by x1): at 100 TB a hot key is
  * first AQE's problem (skewed partitions split automatically at shuffle
  * boundaries), and only becomes salting's problem where AQE can't reach
  * (non-shuffle stages, aggregate-before-join keys). This spec drops the
  * skew thresholds to test scale and proves the splitting actually fires.
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    try {
      import s.implicits._
      // 95% of the probe side lands on one key → one shuffle partition
      // dwarfs the rest
      val probe = (1 to 200000)
        .map(i => (if (i % 20 != 0) 7L else i.toLong % 1000, s"payload-$i"))
        .toDF("k", "payload")
      val build = (0L until 1000L).map(k => (k, s"dim-$k")).toDF("k", "dim")

      val joined = probe.join(build, "k").groupBy("dim").agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    } finally {
      s.stop()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p); SparkSession.setActiveSession(p)
      }
    }
  }
}
