package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the scale contract (SURVEY.md §4). Not "does
  * it return the right rows" (the oracle harness owns that) but "is this the
  * plan we'd want on a 1000-executor cluster": pushdown reaching the scan,
  * column pruning, partial aggregation, planner-chosen (not forced)
  * broadcasts, whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan.toString
  }

  test("q2: filters and projection push down to the parquet scan") {
    val plan = planOf("q2_filter_project")
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("l_shipdate"), plan)
    // unused columns (e.g. l_tax, l_returnflag) must not be read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_returnflag"), readSchema)
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val plan = planOf("q1_pricing_summary")
    // two HashAggregate levels: partial_sum then final sum
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_"), plan)
  }

  test("q3: planner (not a hint) picks broadcast join at small SF") {
    val plan = planOf("q3_shipping_priority")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q5: star join broadcasts the fixed dims") {
    val plan = planOf("q5_local_supplier_volume")
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the fact side stays columnar parquet scan
    assert(plan.contains("Scan parquet"), plan)
  }

  test("q6: selective scan keeps whole-stage codegen and pushes all filters") {
    val plan = planOf("q6_forecast_revenue")
    assert(plan.contains("*("), plan) // WholeStageCodegen span marker
    assert(plan.contains("PushedFilters:"), plan)
  }

  test("t2 wordcount: explode+agg stays inside codegen with partial agg") {
    val plan = planOf("t2_wordcount")
    assert(plan.contains("Generate explode"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("s1 cosine top-k: single-row query vector is broadcast, top-k via TakeOrdered") {
    val plan = planOf("s1_cosine_topk")
    assert(plan.contains("Broadcast"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
