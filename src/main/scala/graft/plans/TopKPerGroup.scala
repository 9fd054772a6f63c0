package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window, WindowGroupLimit, Filter => LFilter}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import graft.sources.arcgis.ArcGisTable

/** Native per-group top-k — the full custom-operator ladder (SURVEY.md §2.10
  * preference (c)): logical node + optimizer rewrite + planner strategy +
  * physical operators, registered through [[GraftExtensions]].
  *
  * The `row_number().over(partitionBy(g).orderBy(o)) <= k` idiom (the
  * reference's queryTopFeatures semantics computed engine-side, S2/`/root/
  * reference/task.ts:400`) is planned by stock Spark as a full sort of every
  * partition under WindowExec (WindowGroupLimit only pre-filters; the sort
  * remains). For small k that sort is wasted work: per-partition bounded
  * HEAPS of size k already hold exactly the surviving rows.
  *
  * Physical shape:
  * {{{
  *   TopKPerGroupMergeExec (k-heap per group, emits rank)   ← exact
  *     Exchange hashpartitioning(group)                     ← inserted by
  *       TopKPerGroupLocalExec (k-heap per group, partial)    EnsureRequirements
  * }}}
  *
  * The local stage caps what the shuffle carries at k rows per (group,
  * input partition) — the same partial-before-shuffle discipline as a
  * partial aggregate — and the merge stage sorts only k rows per group
  * (never a whole partition). State is bounded by groups-per-partition × k
  * rows, independent of input size: no sort buffer, no spill path needed
  * at 100 TB for the small-k regime this targets.
  *
  * The rewrite preserves the Window's output attribute ids (rank included),
  * so parent expressions keep resolving; results are identical to the
  * window formulation whenever the (order, tiebreak) key is unique per
  * group — the same determinism contract every oracle query here already
  * follows (ties under a non-unique key are arbitrary in BOTH
  * formulations, exactly like row_number itself).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupNode =
    copy(child = c)
}

/** Rewrites the generic engine-side `rn <= k` window into the native node.
  * Runs after [[TopKPushdown]] in the user-rule batch, so an ArcGIS scan is
  * rewritten to the REMOTE top-k first and never reaches this rule; the
  * guardrails otherwise mirror TopKPushdown's.
  */
case class TopKToNative() extends Rule[LogicalPlan] {

  private def topK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def hasArcGis(plan: LogicalPlan): Boolean =
    plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[ArcGisTable]
      case _ => false
    }

  /** Our local stage subsumes the cosmetic WindowGroupLimit pre-filter. */
  private def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ LFilter(cond,
          Window(
            Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partitionSpec,
            orderSpec,
            child,
            _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty && !hasArcGis(child) =>
      topK(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 =>
          TopKPerGroupNode(partitionSpec, orderSpec, k, alias.toAttribute,
            stripGroupLimit(child))
        case _ => f
      }
  }
}

/** Plans the node as merge-over-exchange-over-local; EnsureRequirements
  * inserts the hash exchange demanded by the merge's distribution.
  */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, rankAttr, child) =>
      TopKPerGroupMergeExec(group, order, k, rankAttr,
        TopKPerGroupLocalExec(group, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** Bounded k-heaps per group over one partition's rows. The head of each
    * heap is the WORST retained row (reversed ordering), so admission is a
    * single compare against the head.
    */
  def build(
      it: Iterator[InternalRow],
      group: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute]
  ): java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(group, input)
    val ord = RowOrdering.create(order, input)
    val worstFirst = ord.reverse
    val m = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (it.hasNext) {
      val r = it.next()
      val key = keyProj(r)
      var pq = m.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
        m.put(key.copy(), pq)
      }
      if (pq.size < k) pq.add(r.copy())
      else if (ord.compare(r, pq.peek()) < 0) { pq.poll(); pq.add(r.copy()) }
    }
    m
  }
}

/** Partial stage: caps the shuffle at k rows per (group, partition). */
case class TopKPerGroupLocalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (group, ord, kk, input) = (groupExprs, order, k, child.output)
    child.execute().mapPartitions({ it =>
      import scala.jdk.CollectionConverters._
      TopKHeaps.build(it, group, ord, kk, input)
        .values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupLocalExec =
    copy(child = c)
}

/** Final stage: every row of a group is co-located (ClusteredDistribution),
  * so one more bounded-heap pass is exact; each group's k survivors are
  * heap-sorted (k rows, never the partition) and emitted with their rank.
  */
case class TopKPerGroupMergeExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (group, ord, kk, input, out) = (groupExprs, order, k, child.output, output)
    val rank = rankAttr
    child.execute().mapPartitions({ it =>
      import scala.jdk.CollectionConverters._
      val ordering = RowOrdering.create(ord, input)
      val resultProj = UnsafeProjection.create(out, input :+ rank)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      TopKHeaps.build(it, group, ord, kk, input).values().iterator().asScala.flatMap { pq =>
        val arr = pq.toArray(new Array[InternalRow](pq.size))
        java.util.Arrays.sort(arr, ordering)
        arr.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          resultProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupMergeExec =
    copy(child = c)
}
