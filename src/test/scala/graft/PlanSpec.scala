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

  test("b2: correlated scalar subquery decorrelates to one aggregate + join") {
    val plan = planOf("b2_correlated_scalar_avg")
    // no per-row subquery execution: the physical plan is agg + join
    assert(!plan.contains("Subquery"), plan)
    assert(plan.contains("HashAggregate") && plan.contains("Join"), plan)
  }

  test("b3/b4: EXISTS and NOT IN become semi / anti hash joins") {
    val exists = planOf("b3_exists_returns")
    assert(exists.contains("LeftSemi"), exists)
    val notIn = planOf("b4_not_in_subquery")
    assert(notIn.contains("LeftAnti"), notIn)
  }

  test("b9: EXISTS + NOT EXISTS plan has both semi and anti joins, no nested loops over the fact") {
    val plan = planOf("b9_multi_exists")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("d8: top-1 neighbor is a partial aggregate (max_by), not a window over all pairs") {
    val plan = planOf("d8_embedding_nn")
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("t9: custom top-k aggregator runs with map-side partial aggregation") {
    val plan = planOf("t9_top_terms")
    assert(plan.contains("partial_topkterms") || plan.toLowerCase.contains("partial_"), plan)
  }

  test("s6: IVF probe keeps the embedding scan columnar and broadcasts the 1-row query") {
    val plan = planOf("s6_ivf_topk")
    assert(plan.contains("Broadcast"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("p6: centroid M-step is partial aggregation (map-side combine, k output rows)") {
    val plan = planOf("p6_centroid_update")
    assert(plan.contains("partial_"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q29: NOT IN exclusion list plans as a broadcast anti join") {
    val plan = planOf("q29_supplier_cnt")
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("q28: global-fraction threshold is a broadcast of a single-row aggregate") {
    val plan = planOf("q28_important_nations")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("d3: pair join reads the checkpointed encoded table, intersects via popcount") {
    val df = SparkEntry.queries("d3_jaccard_near_dup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan ExistingRDD"), plan)       // encode ran once, checkpointed
    assert(plan.contains("bit_count"), plan)              // bitmask intersection in-plan
  }

  test("d23: the standing corpus is never shuffled — batch keys broadcast into the semi join") {
    val plan = planOf("d23_incremental_dedup")
    // the corpus-side dedup check must be a broadcast semi join (batch keys
    // are the small side); a SortMergeJoin here would mean the 100 TB
    // corpus re-shuffles every incremental run
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // hit keys come back batch-bounded and re-enter as a broadcast too
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("p23: composed manifest is one-dedup-shuffle dominated with broadcast decon + scalar total") {
    val plan = planOf("p23_pipeline_manifest")
    // eval-key decontamination is a broadcast ANTI join, never a shuffle
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the global token total joins back as a single-row broadcast, and no
    // stage falls back to a sort-merge join of corpus-sized sides
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      "BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }
}
