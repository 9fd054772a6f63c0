package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.arcgis.ArcGisTable
import scala.jdk.CollectionConverters._

/** SURVEY.md §4 stretch goal — the one custom optimizer rule: a per-group
  * top-k window over an ArcGIS scan
  *
  * {{{ scan.withColumn("rn", row_number.over(partitionBy(g).orderBy(o)))
  *       .filter(rn <= k).drop("rn") }}}
  *
  * is exactly what the remote `queryTopFeatures` endpoint computes (S2,
  * reference `/root/reference/task.ts:16-19,400`), so rewrite the
  * Project–Filter–Window subtree into a new ArcGIS relation with the
  * topFeatures strategy — the engine-side window (full scan + shuffle +
  * sort) disappears and the server returns only k rows per group.
  *
  * Guardrails: fires only when the window is a single `row_number` over one
  * partition attribute and one ascending order attribute, the filter is a
  * literal top-k bound on that row number, and no parent expression still
  * references the rank column. Column pruning may have inserted a
  * pass-through Project (and later batches a WindowGroupLimit) between the
  * Window and the relation — the search descends through both and the
  * replacement relation reproduces the pruned output exactly.
  */
case class TopKPushdown() extends Rule[LogicalPlan] {

  private def topK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private def findArcGisRelation(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan match {
      case r: DataSourceV2Relation if r.table.isInstanceOf[ArcGisTable] => Some(r)
      case WindowGroupLimit(_, _, _, _, child) => findArcGisRelation(child)
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        findArcGisRelation(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
          Filter(cond,
            Window(
              Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
              Seq(part: AttributeReference),
              Seq(SortOrder(order: AttributeReference, Ascending, _, _)),
              child,
              _)))
        if findArcGisRelation(child).isDefined &&
          !projectList.exists(_.references.contains(alias.toAttribute)) &&
          child.output.forall(_.isInstanceOf[AttributeReference]) =>
      (topK(cond, alias.toAttribute), findArcGisRelation(child)) match {
        case (Some(k), Some(rel)) if k >= 1 =>
          val outAttrs = child.output.map(_.asInstanceOf[AttributeReference])
          val newOpts = new CaseInsensitiveStringMap(
            (rel.options.asCaseSensitiveMap().asScala.toMap ++ Map(
              "strategy" -> "queryTopFeatures",
              "topCount" -> k.toString,
              "groupByField" -> part.name,
              "orderByField" -> order.name
            )).asJava
          )
          val newSchema = StructType(
            outAttrs.map(a => StructField(a.name, a.dataType, a.nullable))
          )
          val newRel = rel.copy(
            table = new ArcGisTable(newSchema, newOpts),
            output = outAttrs,
            options = newOpts
          )
          Project(projectList, newRel)
        case _ => p
      }
  }
}

/** Register with `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`). Adds the top-k
  * pushdown rule and exposes the engine's kernel catalog to SQL users:
  * geo (`mercator_x/y`), vectors (`vec_dot`, `vec_norm`, `pq_dists`), text
  * (`shingle_array`, `simhash60`, set-intersection merges) and the binary
  * media codecs (`wav_pack`, `wav_meta`, `pcm_stats`) — so a pure-SQL
  * caller gets the same codegen'd expressions the DataFrame API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.{DotProduct, FrameSums, L2Norm, MercatorX, MercatorY, PcmFingerprint,
    PcmStats, PqDists, ShingleArray, SimHash60, SortedIntersectSize, SortedIntersectSizeInt,
    SortedIntersectSizeLong, WavMeta, WavPack}

  private def fn(
      e: SparkSessionExtensions,
      name: String,
      clazz: Class[_],
      build: Seq[Expression] => Expression
  ): Unit =
    e.injectFunction((new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build))

  /** Resolve a scalar function argument that must be a plan-time integer
    * (e.g. `shingle_array(text, 5)`). A bare `asInstanceOf[Int]` on
    * `eval()` breaks on a BIGINT literal (`CAST(8 AS BIGINT)` evals to
    * java.lang.Long → ClassCastException) and on a non-foldable arg
    * (column reference → wrong value or NPE) with no useful message.
    * Require foldability, coerce any numeric type via Number#intValue,
    * and name the function in the error.
    */
  private def foldableInt(fnName: String, argName: String, arg: Expression): Int = {
    if (!arg.foldable)
      throw new IllegalArgumentException(
        s"$fnName: argument '$argName' must be a literal integer, " +
          s"got non-foldable expression ${arg.sql}")
    arg.eval() match {
      case n: Number =>
        // intValue() alone would silently truncate 2.9 → 2 or an
        // out-of-Int-range BIGINT → garbage — the same silent-wrong-value
        // class this helper exists to eliminate. Reject both loudly.
        if (n.doubleValue() != n.intValue().toDouble)
          throw new IllegalArgumentException(
            s"$fnName: argument '$argName' must be an integral value in Int range, got $n")
        n.intValue()
      case null =>
        throw new IllegalArgumentException(
          s"$fnName: argument '$argName' must not be NULL")
      case other =>
        throw new IllegalArgumentException(
          s"$fnName: argument '$argName' must be an integer literal, " +
            s"got ${other.getClass.getSimpleName} (${arg.sql})")
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKPushdown())
    e.injectOptimizerRule(_ => TopKToNative())
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    fn(e, "mercator_x", classOf[MercatorX], args => MercatorX.cast(args.head))
    fn(e, "mercator_y", classOf[MercatorY], args => MercatorY.cast(args.head))
    fn(e, "vec_dot", classOf[DotProduct], args => DotProduct(args(0), args(1)))
    fn(e, "vec_norm", classOf[L2Norm], args => L2Norm(args.head))
    fn(e, "shingle_array", classOf[ShingleArray],
      args => ShingleArray(args(0), foldableInt("shingle_array", "k", args(1))))
    fn(e, "set_intersect_size", classOf[SortedIntersectSize],
      args => SortedIntersectSize(args(0), args(1)))
    fn(e, "set_intersect_size_int", classOf[SortedIntersectSizeInt],
      args => SortedIntersectSizeInt(args(0), args(1)))
    fn(e, "set_intersect_size_long", classOf[SortedIntersectSizeLong],
      args => SortedIntersectSizeLong(args(0), args(1)))
    fn(e, "simhash60", classOf[SimHash60], args => SimHash60(args.head))
    fn(e, "pq_dists", classOf[PqDists], args => PqDists(args.head))
    fn(e, "wav_pack", classOf[WavPack],
      args => WavPack(args(0), args(1), args(2), args(3)))
    fn(e, "wav_meta", classOf[WavMeta], args => WavMeta(args.head))
    fn(e, "pcm_stats", classOf[PcmStats], args => PcmStats(args.head))
    fn(e, "pcm_fingerprint", classOf[PcmFingerprint],
      args => PcmFingerprint(args(0), foldableInt("pcm_fingerprint", "bins", args(1))))
    fn(e, "frame_sums", classOf[FrameSums],
      args => FrameSums(args(0), foldableInt("frame_sums", "frameLen", args(1))))
  }
}
