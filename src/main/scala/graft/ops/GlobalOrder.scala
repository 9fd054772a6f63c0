package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distributed global ordering: exact global `row_number` / running sums
  * without the single-task global window.
  *
  * `Window.orderBy(...)` with no PARTITION BY moves the ENTIRE input into one
  * task (WindowExec logs "No Partition Defined ... Moving all data to a
  * single partition") — one core sorts everything, which caps the operator at
  * single-node scale. That is acceptable only for provably tiny inputs (e.g.
  * [[TokenSets]]' ≤63-row dictionary); for anything data-sized — a corpus
  * vocabulary, a packing manifest — the scalable formulation is the
  * `RDD.zipWithIndex` two-job pattern, kept here in DataFrame land:
  *
  *   1. range-shuffle on the sort key (`repartitionByRange`, the same
  *      sampling-based partitioner a distributed ORDER BY uses), so every
  *      row in physical partition i sorts strictly before partition i+1;
  *   2. partition-local sort (`sortWithinPartitions` — NO second exchange)
  *      and a narrow per-partition scan assigning local ranks / running
  *      sums: P parallel sorts of ~N/P rows;
  *   3. per-partition counts/sums (≤ groups×P tiny rows, the same
  *      driver-side metadata `RDD.zipWithIndex` collects) become prefix
  *      offsets, shipped to executors inside the scan closure;
  *   4. global value = local value + offset(partition [, group]).
  *
  * The scan is a per-partition iterator deliberately: the alternative — a
  * Window over (partition-id, group) — satisfies its ClusteredDistribution
  * with a SECOND full hash exchange, because Catalyst cannot know the data
  * is already physically partitioned by the stamped partition id. One narrow
  * operator in exchange for one fewer full shuffle is the right trade at any
  * scale.
  *
  * The scan runs at the `InternalRow` level (`queryExecution.toRdd` in,
  * `internalCreateDataFrame` out) rather than `Dataset.mapPartitions`: the
  * encoder route compiles a per-schema `Encoders.row` serializer +
  * deserializer pair (~1.2s of Janino work per distinct schema per JVM —
  * measured round 10, the whole first-rep spike on this family) and then
  * boxes every row out to external `Row` objects and back. Appending the
  * rank/sum through a reused `JoinedRow` keeps the row in Tungsten format
  * end-to-end; the only codegen left is the output projection Spark builds
  * for any RDD scan. Upstream iterators reuse `UnsafeRow` buffers, so the
  * group-key values the scan holds across rows are defensively copied
  * ([[copyVal]]) and nothing else is buffered.
  *
  * Exact and deterministic when `sortCols` is a total order (callers pass a
  * unique tiebreak column, same as any reproducible rank); every task holds
  * ~1/P of the data regardless of N.
  *
  * == Deployment note: localCheckpoint and fault tolerance ==
  *
  * The range-shuffled frame is materialized with `localCheckpoint()` because
  * `repartitionByRange` EXECUTES ITS INPUT TWICE (once for the range-boundary
  * sampling pass, once for the shuffle write) and the offsets job plus the
  * downstream consumer must see the same sampled partition boundaries.
  * `localCheckpoint` stores the blocks in executor block managers: on a
  * single machine (this repo's bench/verify) that is free of cluster risk,
  * but on a real cluster it is NOT fault-tolerant — a lost executor loses
  * its blocks and the truncated lineage cannot recompute them (the job
  * fails and must be rerun), and the pinned blocks hold block-manager
  * memory/disk until the driver GCs the frame. For long-running cluster
  * deployments, substitute reliable checkpointing: set
  * `spark.checkpoint.dir` to durable storage and call `.checkpoint()`
  * (or write/read an intermediate table) at the `localCheckpoint()` sites —
  * same plan shape and semantics, one extra write to durable storage. The
  * trade is deliberate here: checkpointed frames in these operators are
  * aggregate-/document-sized, recomputed inside every run, and never reused
  * across runs.
  */
object GlobalOrder {

  /** Adds `rnCol` = exact global row_number (1-based, LongType) of each row
    * under `sortCols`. The range shuffle is materialized once
    * (localCheckpoint) so the offsets job and the downstream consumer see the
    * same sampled partition boundaries and the input is not recomputed.
    */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__go_pid", spark_partition_id())
      .localCheckpoint()
    // P rows of (pid, count) — bounded by the partition count, not the data
    val counts = ranged
      .groupBy(col("__go_pid")).agg(count(lit(1)).as("__go_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // prefix-sum offsets in pid order (absent pids are empty → contribute 0)
    val offByPid: Map[Int, Long] =
      counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2)).toMap
    val sorted = ranged.sortWithinPartitions(sortCols: _*)
    val pidIdx = sorted.schema.fieldIndex("__go_pid")
    val outSchema = sorted.schema.add(rnCol, LongType, nullable = false)
    val rdd = GraftShims.toInternalRdd(sorted).mapPartitions { it =>
      var rn = 0L
      var off = 0L
      var seen = false
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (!seen) { off = offByPid.getOrElse(r.getInt(pidIdx), 0L); seen = true }
        rn += 1
        extra.update(0, rn + off)
        joined(r, extra): InternalRow
      }
    }
    GraftShims.internalCreateDataFrame(spark, rdd, outSchema).drop("__go_pid")
  }

  /** Adds `rnCol` = exact per-group row_number (1-based, LongType) under
    * `sortCols`, plus `cntCol` = the group's total row count — WITHOUT
    * hash-partitioning on the group key.
    *
    * `Window.partitionBy(g)` caps parallelism at the number of distinct
    * groups: a 3-value grouping column sorts the whole table in 3 tasks no
    * matter how many executors exist. Here the range shuffle spans
    * (groupCols ++ sortCols), so ONE group's rows spread over many
    * contiguous partitions and every task sorts ~1/P of the data; the
    * per-(group, partition) counts (≤ groups×P tiny rows) are collected,
    * prefix-summed per group in partition order, and shipped back inside
    * the scan closure. Exact and deterministic when sortCols totally
    * orders rows within a group. This is the scalable form of per-group
    * rank / ntile over low-cardinality massive groups.
    */
  def withGroupedRowNumber(
      df: DataFrame,
      rnCol: String,
      cntCol: String,
      groupCols: Seq[String],
      sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val rangeCols = groupCols.map(col) ++ sortCols
    val ranged = df
      .repartitionByRange(p, rangeCols: _*)
      .withColumn("__go_pid", spark_partition_id())
      .localCheckpoint()
    // ≤ groups×P rows of (pid, group..., count) — partition-count-bounded.
    // Collected in CATALYST space (copied InternalRows) so the driver-built
    // offset keys compare equal to executor-extracted values (UTF8String vs
    // String, Decimal vs BigDecimal) without a per-row conversion.
    val partials = ranged
      .groupBy(col("__go_pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__go_n"))
    val gN = groupCols.size
    val gTypes = groupCols.indices.map(i => partials.schema(i + 1).dataType)
    val counts = GraftShims.toInternalRdd(partials).map(_.copy()).collect()
    val byGroup = counts.groupBy(r => groupCols.indices.map(i => r.get(i + 1, gTypes(i))).toIndexedSeq)
    // per-group prefix offsets in pid order + per-group totals (no ordering
    // needed ACROSS groups — only pid order within each group key)
    val offTot: Map[(Int, IndexedSeq[Any]), (Long, Long)] = byGroup.toSeq.flatMap {
      case (gvals, rs) =>
        val srt = rs.sortBy(_.getInt(0))
        val total = srt.map(_.getLong(gN + 1)).sum
        srt.map(_.getInt(0))
          .zip(srt.scanLeft(0L)(_ + _.getLong(gN + 1)))
          .map { case (pid, off) => (pid, gvals) -> (off, total) }
    }.toMap
    val sorted = ranged.sortWithinPartitions(rangeCols: _*)
    val pidIdx = sorted.schema.fieldIndex("__go_pid")
    val gIdx = groupCols.map(sorted.schema.fieldIndex).toIndexedSeq
    val gDts = gIdx.map(i => sorted.schema(i).dataType)
    val outSchema = sorted.schema
      .add(rnCol, LongType, nullable = false)
      .add(cntCol, LongType, nullable = false)
    val rdd = GraftShims.toInternalRdd(sorted).mapPartitions { it =>
      var pid = -1
      var rn = 0L
      var off = 0L
      var tot = 0L
      val extra = new GenericInternalRow(2)
      val joined = new JoinedRow
      // key extraction specialized by arity (r19, same as the running-sum
      // scan): no tracking for ungrouped calls, single boxed value for the
      // common one-column group — no per-row IndexedSeq allocation
      var curKey1: Any = null
      var curKeyN: IndexedSeq[Any] = null
      var started = false
      def keyChanged(r: InternalRow): Boolean =
        if (gN == 0) !started
        else if (gN == 1) {
          val k = r.get(gIdx(0), gDts(0))
          if (!started || k != curKey1) { curKey1 = copyVal(k); true } else false
        } else {
          val k: IndexedSeq[Any] = gIdx.indices.map(i => r.get(gIdx(i), gDts(i)))
          if (!started || k != curKeyN) { curKeyN = k.map(copyVal); true } else false
        }
      def lookupKey: IndexedSeq[Any] =
        if (gN == 0) IndexedSeq.empty
        else if (gN == 1) IndexedSeq(curKey1)
        else curKeyN
      it.map { r =>
        if (pid < 0) pid = r.getInt(pidIdx)
        if (keyChanged(r)) {
          started = true
          rn = 0L
          val ot = offTot.getOrElse((pid, lookupKey), (0L, 0L))
          off = ot._1; tot = ot._2
        }
        rn += 1
        extra.update(0, rn + off)
        extra.update(1, tot)
        joined(r, extra): InternalRow
      }
    }
    GraftShims.internalCreateDataFrame(spark, rdd, outSchema).drop("__go_pid")
  }

  /** Adds `runCol` = exact per-group RUNNING SUM of `measure` under
    * `sortCols`, plus `totCol` = the group's total — the prefix-sum
    * generalization of [[withGroupedRowNumber]] (which is the special case
    * `measure = 1`). Same scale mechanics: range shuffle over
    * (groupCols ++ sortCols) spreads a low-cardinality group across many
    * partitions; the per-(group, partition) partial sums (≤ groups×P tiny
    * rows) collect to the driver, prefix-sum per group in partition order,
    * and ride back inside the scan closure as offsets added to each
    * partition's local running sum. This is the distributed form of
    * cumulative weight / running revenue over massive skewed groups —
    * never a whole-group single task, never a second exchange.
    *
    * Exactness: arithmetic follows `sum(measure)`'s Spark type; pass an
    * exact type (decimal / integral) for order-free, oracle-exact prefix
    * sums. Rows where `measure` is null contribute nothing (SQL SUM
    * semantics) but still receive the running value.
    */
  def withGroupedRunningSum(
      df: DataFrame,
      runCol: String,
      totCol: String,
      measure: Column,
      groupCols: Seq[String],
      sortCols: Seq[Column]): DataFrame =
    withGroupedRunningSums(df, Seq((runCol, totCol, measure)), groupCols, sortCols)

  /** Adds, for EACH `(runCol, totCol, measure)` spec, the exact per-group
    * running sum and group total of that measure under `sortCols` — the
    * N-measure generalization of [[withGroupedRunningSum]]. All measures
    * share ONE range shuffle, one materialization and one offsets pass
    * (r19: t19's token + vocabulary curves previously chained two
    * independent range shuffles over the same doc-keyed frame; guide §2.4 —
    * two operations keyed the same way share one exchange).
    *
    * Per-task specializations (r19, guide §1.2 step 2 — per-task work after
    * the algorithm is right): no key tracking when `groupCols` is empty
    * (x20/x21/p17/t19's whole-corpus prefix sums paid a per-row empty-Seq
    * allocation and comparison), single-value keys avoid the per-row
    * IndexedSeq wrapper, and all-long measure sets accumulate in a
    * primitive array (no Decimal/Any boxing in the hot loop).
    */
  def withGroupedRunningSums(
      df: DataFrame,
      specs: Seq[(String, String, Column)],
      groupCols: Seq[String],
      sortCols: Seq[Column]): DataFrame = {
    require(specs.nonEmpty, "withGroupedRunningSums needs at least one measure")
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val rangeCols = groupCols.map(col) ++ sortCols
    val nM = specs.size
    val mCols = specs.indices.map(i => s"__go_m$i")
    val ranged = specs.zipWithIndex
      .foldLeft(df) { case (acc, ((_, _, m), i)) => acc.withColumn(mCols(i), m) }
      .repartitionByRange(p, rangeCols: _*)
      .withColumn("__go_pid", spark_partition_id())
      .localCheckpoint()
    val partials = ranged
      .groupBy(col("__go_pid") +: groupCols.map(col): _*)
      .agg(sum(col(mCols.head)).as("__go_s0"),
        mCols.tail.zipWithIndex.map { case (c, i) => sum(col(c)).as(s"__go_s${i + 1}") }: _*)
    val gN = groupCols.size
    val gTypes = groupCols.indices.map(i => partials.schema(i + 1).dataType)
    val sTypes = specs.indices.map(i => partials.schema(s"__go_s$i").dataType)
    def zeroOf(t: org.apache.spark.sql.types.DataType): Any = t match {
      case _: DecimalType => Decimal(0)
      case LongType => 0L
      case _ => 0.0
    }
    // widen raw catalyst measure values to the accumulator type (sum(int) is
    // long, sum(float) is double — the scan must accumulate in the same type)
    def widen(v: Any): Any = v match {
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case f: Float => f.toDouble
      case x => x
    }
    def plus(a: Any, b: Any): Any = (a, widen(b)) match {
      case (x, null) => x
      case (null, y) => y
      case (x: Decimal, y: Decimal) => x + y
      case (x: Long, y: Long) => x + y
      case (x: Double, y: Double) => x + y
      case (x, y) => throw new IllegalArgumentException(s"unsupported measure sum: $x + $y")
    }
    // catalyst-space collect, same rationale as withGroupedRowNumber
    val counts = GraftShims.toInternalRdd(partials).map(_.copy()).collect()
    val byGroup = counts.groupBy(r => groupCols.indices.map(i => r.get(i + 1, gTypes(i))).toIndexedSeq)
    // per (pid, group): the prefix offset and group total of EVERY measure
    val offTot: Map[(Int, IndexedSeq[Any]), (IndexedSeq[Any], IndexedSeq[Any])] =
      byGroup.toSeq.flatMap { case (gvals, rs) =>
        val srt = rs.sortBy(_.getInt(0))
        def m(r: InternalRow, i: Int): Any = r.get(gN + 1 + i, sTypes(i))
        val totals = specs.indices.map(i =>
          srt.foldLeft(zeroOf(sTypes(i)))((acc, r) => plus(acc, m(r, i))))
        val offs = srt.scanLeft(specs.indices.map(i => zeroOf(sTypes(i)))) {
          (acc, r) => specs.indices.map(i => plus(acc(i), m(r, i)))
        }
        srt.map(_.getInt(0)).zip(offs).map {
          case (pid, off) => (pid, gvals) -> (off, totals)
        }
      }.toMap
    val sorted = ranged.sortWithinPartitions(rangeCols: _*)
    val pidIdx = sorted.schema.fieldIndex("__go_pid")
    val mIdx = mCols.map(sorted.schema.fieldIndex).toArray
    val mDts = mIdx.map(i => sorted.schema(i).dataType)
    val outSchema = specs.zipWithIndex.foldLeft(sorted.schema) {
      case (sc, ((run, tot, _), i)) =>
        sc.add(run, sTypes(i), nullable = true).add(tot, sTypes(i), nullable = true)
    }
    val gIdx = groupCols.map(sorted.schema.fieldIndex).toIndexedSeq
    val gDts = gIdx.map(i => sorted.schema(i).dataType)
    val allLong = sTypes.forall(_ == LongType) &&
      mDts.forall(t => t == LongType || t == IntegerType ||
        t == org.apache.spark.sql.types.ShortType || t == org.apache.spark.sql.types.ByteType)
    val sTypesArr = sTypes.toArray
    val rdd = GraftShims.toInternalRdd(sorted).mapPartitions { it =>
      var pid = -1
      val extra = new GenericInternalRow(2 * nM)
      val joined = new JoinedRow
      // group-key extraction specialized by arity: gN == 0 never tracks a
      // key; gN == 1 compares a single boxed value (no Seq allocation)
      var curKey1: Any = null
      var curKeyN: IndexedSeq[Any] = null
      var started = false
      def keyChanged(r: InternalRow): Boolean =
        if (gN == 0) !started
        else if (gN == 1) {
          val k = r.get(gIdx(0), gDts(0))
          if (!started || k != curKey1) { curKey1 = copyVal(k); true } else false
        } else {
          val k: IndexedSeq[Any] = gIdx.indices.map(i => r.get(gIdx(i), gDts(i)))
          if (!started || k != curKeyN) { curKeyN = k.map(copyVal); true } else false
        }
      def lookupKey: IndexedSeq[Any] =
        if (gN == 0) IndexedSeq.empty
        else if (gN == 1) IndexedSeq(curKey1)
        else curKeyN
      if (allLong) {
        // primitive fast path: long accumulators, no boxing per row
        val local = new Array[Long](nM)
        val off = new Array[Long](nM)
        val tot = new Array[Long](nM)
        it.map { r =>
          if (pid < 0) pid = r.getInt(pidIdx)
          if (keyChanged(r)) {
            started = true
            java.util.Arrays.fill(local, 0L)
            val ot = offTot.getOrElse((pid, lookupKey),
              (IndexedSeq.fill[Any](nM)(0L), IndexedSeq.fill[Any](nM)(0L)))
            var i = 0
            while (i < nM) {
              off(i) = ot._1(i).asInstanceOf[Long]
              tot(i) = ot._2(i).asInstanceOf[Long]
              i += 1
            }
          }
          var i = 0
          while (i < nM) {
            if (!r.isNullAt(mIdx(i))) local(i) += (mDts(i) match {
              case LongType => r.getLong(mIdx(i))
              case IntegerType => r.getInt(mIdx(i)).toLong
              case org.apache.spark.sql.types.ShortType => r.getShort(mIdx(i)).toLong
              case _ => r.getByte(mIdx(i)).toLong
            })
            extra.update(2 * i, local(i) + off(i))
            extra.update(2 * i + 1, tot(i))
            i += 1
          }
          joined(r, extra): InternalRow
        }
      } else {
        val local = new Array[Any](nM)
        val off = new Array[Any](nM)
        val tot = new Array[Any](nM)
        // one zeros vector per partition, not per key change (ADVICE r19):
        // zeroOf values are immutable (Decimal(0)/0L/0.0), safe to share
        val zeros: IndexedSeq[Any] = sTypesArr.toIndexedSeq.map(zeroOf)
        it.map { r =>
          if (pid < 0) pid = r.getInt(pidIdx)
          if (keyChanged(r)) {
            started = true
            val ot = offTot.getOrElse((pid, lookupKey), (zeros, zeros))
            var i = 0
            while (i < nM) {
              local(i) = zeros(i); off(i) = ot._1(i); tot(i) = ot._2(i)
              i += 1
            }
          }
          var i = 0
          while (i < nM) {
            local(i) = plus(local(i), r.get(mIdx(i), mDts(i)))
            extra.update(2 * i, plus(local(i), off(i)))
            extra.update(2 * i + 1, tot(i))
            i += 1
          }
          joined(r, extra): InternalRow
        }
      }
    }
    GraftShims.internalCreateDataFrame(spark, rdd, outSchema)
      .drop("__go_pid" +: mCols: _*)
  }

  /** Defensive copy of a catalyst value extracted from a (possibly reused)
    * UnsafeRow buffer. Primitives and Decimal are fresh objects already;
    * UTF8String/array/map/struct values are views into the row's bytes.
    */
  private def copyVal(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case r: InternalRow => r.copy()
    case x => x
  }
}
