package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("probe admits every present key and prunes most absent ones") {
    import spark.implicits._
    val build = (0 until 1000).map(i => s"key_$i").toDF("k")
    val probeIn = (0 until 2000).map(i => s"key_$i").toDF("k")
    val kept = probeIn
      .filter(graft.ops.BloomProbe.mightContain(build, "k", col("k"), expectedItems = 1000L))
      .as[String].collect().toSet
    // no false negatives: all 1000 present keys survive
    assert((0 until 1000).forall(i => kept.contains(s"key_$i")))
    // absent keys are mostly pruned (fpp 3% on 1000 absent keys — allow 10x)
    val falsePos = kept.count(_.drop(4).toInt >= 1000)
    assert(falsePos <= 300, s"bloom pruned almost nothing: $falsePos false positives")
  }

  test("query construction runs no Spark job (build is lazy, not an action)") {
    import spark.implicits._
    spark.sparkContext.setJobGroup("bloom-lazy", "bloom-lazy")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup("bloom-lazy").length
    val build = (0 until 100).map(i => s"v$i").toDF("k")
    val out = (0 until 100).map(i => s"v$i").toDF("k")
      .filter(graft.ops.BloomProbe.mightContain(build, "k", col("k")))
    // constructing the filtered frame (and its plan) must not launch a job —
    // the DataFrameStatFunctions.bloomFilter path this replaced ran TWO
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup("bloom-lazy").length
    assert(after == before, "plan construction launched a Spark job")
    assert(out.count() == 100) // and the plan still executes
    spark.sparkContext.clearJobGroup()
  }

  test("probe is a plan-native expression (scalar subquery, no ScalaUDF)") {
    import spark.implicits._
    val build = (0 until 10).map(i => s"v$i").toDF("k")
    val out = (0 until 10).map(i => s"v$i").toDF("k")
      .filter(graft.ops.BloomProbe.mightContain(build, "k", col("k")))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("scalar-subquery") || plan.contains("Subquery"), plan)
    assert(!plan.contains("UDF"), s"probe fell back to a udf closure:\n$plan")
  }

  test("bloom prune + exact join is bit-identical to the unfiltered join") {
    import spark.implicits._
    val ev = (0 until 500).filter(_ % 7 == 0).map(i => s"sh_$i").toDF("shingle")
    val tr = (0 until 500).map(i => (i.toLong, s"sh_$i")).toDF("doc_id", "shingle")
    def counted(pruned: Boolean) = {
      val base = if (pruned)
        tr.filter(graft.ops.BloomProbe.mightContain(ev, "shingle", col("shingle"), 500L))
      else tr
      base.join(broadcast(ev), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id")).collect().toSeq
    }
    assert(counted(pruned = true) == counted(pruned = false))
  }
}
