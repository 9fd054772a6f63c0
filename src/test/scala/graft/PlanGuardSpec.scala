package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.expressions.{ArrayExcept, ArrayIntersect, ArraysOverlap, ArrayUnion, Attribute, EqualTo, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.scalatest.funsuite.AnyFunSuite

/** Universal physical-plan invariants enforced over EVERY registered query —
  * the automated form of the PLANS.md scale audit. [[PlanSpec]] asserts
  * per-query shapes; this spec asserts the three structures that are NEVER
  * acceptable at 100 TB unless provably bounded:
  *
  *  1. A window over an unpartitioned frame (`WindowExec` with empty
  *     partitionSpec) serializes the whole input through one task. Banned
  *     outright — distributed order statistics go through
  *     [[graft.ops.GlobalOrder]] instead.
  *  2. A cartesian product scales as |L|·|R|. Banned outright.
  *     `BroadcastNestedLoopJoin` (how Catalyst plans `crossJoin(broadcast(…))`)
  *     is allowed ONLY when the broadcast side is bounded BY CONSTRUCTION:
  *     a grouping-free (global) aggregate (≤1 row), a point-lookup filter
  *     (`col = literal` on a key), a LIMIT, or a literal local table.
  *  3. A single-partition shuffle serializes through one reducer. Allowed
  *     ONLY under the global-aggregate merge pattern — the subtree below it
  *     partial-aggregates without grouping first, so exactly one row per
  *     input partition crosses the wire (or the subtree below is itself a
  *     bounded broadcast-side shape per rule 2, e.g. a global LIMIT).
  *  4. A super-linear scalar kernel (Levenshtein's O(m·n) DP, the O(m+n)
  *     set-array operators) inside a JOIN CONDITION. The condition runs
  *     once per probe-side candidate, and predicate pushdown silently
  *     CLONES a post-join filter into it — observed on d11, where
  *     levenshtein executed inside the broadcast hash probe and again in
  *     the downstream projection, confined to the probe scan's
  *     parallelism. The scalable form is a materialization barrier
  *     (exchange + checkpoint of the candidate pairs) between the join
  *     and the kernel, which also runs the kernel exactly once per pair.
  *     Rule 4b extends the check beyond join conditions: the clone can
  *     equally land in a `FilterExec` on the probe side, so any hot kernel
  *     whose canonicalized form is evaluated in MORE than one
  *     filter/project operator of the plan fails the guard (one occurrence
  *     — a deliberate linear scan — stays legal).
  *
  * Every query runs at sf0.001 with AQE finalized (collect() first), and the
  * traversal descends through adaptive wrapper nodes, reused exchanges and
  * subqueries so nothing hides inside a query stage.
  */
class PlanGuardSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: (children ++ p.subqueries).flatMap(allNodes)
  }

  /** Nodes of the stage rooted at `p`, NOT descending through exchanges —
    * "what feeds this operator within its own stage".
    */
  private def stageNodes(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: Exchange => Seq.empty
      case other => other.children
    }
    p +: children.flatMap(stageNodes)
  }

  private def groupingFreeAggregate(p: SparkPlan): Boolean = p match {
    case a: HashAggregateExec => a.groupingExpressions.isEmpty
    case a: ObjectHashAggregateExec => a.groupingExpressions.isEmpty
    case a: SortAggregateExec => a.groupingExpressions.isEmpty
    case _ => false
  }

  private def pointLookupFilter(p: SparkPlan): Boolean = p match {
    case f: FilterExec =>
      f.condition.exists {
        case EqualTo(_: Attribute, _: Literal) => true
        case EqualTo(_: Literal, _: Attribute) => true
        case _ => false
      }
    case _ => false
  }

  /** Scan of a fixed-cardinality dimension: `region` (5 rows) and `nation`
    * (25 rows) have schema-pinned cardinality at EVERY TPC-H scale factor,
    * so broadcasting a frame derived from them is bounded at 100 TB too.
    */
  private def fixedDimScan(p: SparkPlan): Boolean = p match {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.exists { path =>
        val s = path.toString
        s.endsWith("nation.parquet") || s.endsWith("region.parquet")
      }
    case _ => false
  }

  /** Bounded-by-construction subtree: global aggregate, point lookup,
    * LIMIT, literal rows, or a fixed-cardinality dim scan anywhere below
    * (without crossing an exchange the bound still holds — a global agg
    * below an exchange is still ≤1 row per partition, and the whole subtree
    * feeds a broadcast that materializes it).
    */
  private def boundedSubtree(p: SparkPlan): Boolean =
    allNodes(p).exists { n =>
      groupingFreeAggregate(n) || pointLookupFilter(n) || fixedDimScan(n) ||
        n.isInstanceOf[LocalTableScanExec] || n.isInstanceOf[LocalLimitExec] ||
        n.isInstanceOf[GlobalLimitExec] || n.isInstanceOf[TakeOrderedAndProjectExec]
    }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no unbounded windows, cartesians, or single-partition funnels") {
      val df = fn(spark, sf)
      df.collect() // materialize so AQE finalizes every stage
      val nodes = allNodes(df.queryExecution.executedPlan)

      nodes.foreach {
        case w: WindowExec =>
          assert(
            w.partitionSpec.nonEmpty,
            s"$name: WindowExec with no partition spec — whole input through one task:\n$w")
        case w: WindowGroupLimitExec =>
          assert(
            w.partitionSpec.nonEmpty,
            s"$name: WindowGroupLimitExec with no partition spec:\n$w")
        case c: CartesianProductExec =>
          fail(s"$name: CartesianProductExec — |L|x|R| scaling:\n$c")
        case j: BroadcastNestedLoopJoinExec =>
          val (build, _) = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => (j.left, j.right)
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => (j.right, j.left)
          }
          assert(
            boundedSubtree(build),
            s"$name: BroadcastNestedLoopJoin whose broadcast side is not bounded " +
              s"by construction (no global aggregate / point lookup / limit / " +
              s"literal table in its subtree):\n${build.treeString.linesIterator.take(15).mkString("\n")}")
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
          val below = stageNodes(e.child)
          assert(
            below.exists(groupingFreeAggregate) || boundedSubtree(e.child),
            s"$name: single-partition exchange without a grouping-free partial " +
              s"aggregate (or other bound) below it — unbounded rows through one " +
              s"reducer:\n${e.child.treeString.linesIterator.take(15).mkString("\n")}")
        case _ =>
      }

      // rule 4: super-linear scalar kernels must not ride join conditions
      def hotKernels(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        e.collect {
          case k: Levenshtein => k
          case k: ArrayIntersect => k
          case k: ArrayExcept => k
          case k: ArrayUnion => k
          case k: ArraysOverlap => k
        }
      nodes.foreach {
        case j: BaseJoinExec =>
          j.condition.foreach { c =>
            val hot = hotKernels(c)
            assert(
              hot.isEmpty,
              s"$name: ${hot.map(_.prettyName).distinct.mkString(",")} inside a " +
                s"${j.nodeName} condition — runs per probe candidate (and pushdown " +
                s"may have cloned a post-join filter here); put a materialization " +
                s"barrier between the join and the kernel:\n$c")
          }
        case _ =>
      }

      // rule 4b (ADVICE r16): the same cloning failure class can land the
      // kernel in a FilterExec below the join instead of the join condition
      // — pushdown copies a post-join predicate down the probe side, where
      // the kernel runs once in the pushed filter and AGAIN in the
      // projection/filter it was cloned from. The cloning signature is the
      // SAME canonicalized kernel expression evaluated in more than one
      // operator; a single occurrence (a deliberate linear-scan filter or
      // projection) stays legal. Occurrences dedupe by node identity first:
      // allNodes revisits reused-exchange subtrees, and the same physical
      // node must not count twice.
      val hotOccurrences = nodes.flatMap {
        case f: FilterExec =>
          hotKernels(f.condition)
            .map(k => (k.canonicalized, System.identityHashCode(f), f.nodeName))
        case p: ProjectExec =>
          p.projectList.flatMap(hotKernels)
            .map(k => (k.canonicalized, System.identityHashCode(p), p.nodeName))
        case _ => Seq.empty
      }.distinct
      hotOccurrences.groupBy(_._1).foreach { case (k, occ) =>
        assert(
          occ.map(_._2).distinct.size <= 1,
          s"$name: ${k.prettyName} evaluated in ${occ.size} operators " +
            s"(${occ.map(_._3).mkString(", ")}) — pushdown cloned a hot kernel; " +
            s"materialize the pair frame before filtering/projecting on it")
      }
    }
  }
}
