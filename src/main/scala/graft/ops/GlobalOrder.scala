package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering: exact global `row_number` without the
  * single-task global window.
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
  *   2. `row_number` within each partition — P parallel sorts of ~N/P rows;
  *   3. per-partition row counts (exactly P numbers, the same driver-side
  *      metadata `RDD.zipWithIndex` collects) become prefix offsets,
  *      attached as a broadcast literal map;
  *   4. global row_number = local row_number + offset(partition).
  *
  * Exact and deterministic when `sortCols` is a total order (callers pass a
  * unique tiebreak column, same as any reproducible rank); every task holds
  * ~1/P of the data regardless of N.
  */
object GlobalOrder {

  /** Adds `rnCol` = exact global row_number (1-based, LongType) of each row
    * under `sortCols`. The range shuffle is materialized once
    * (localCheckpoint) so the offsets job and the downstream consumer see the
    * same sampled partition boundaries and the input is not recomputed.
    */
  def withRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
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
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2))
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else
        coalesce(
          element_at(
            map(offsets.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*),
            col("__go_pid")),
          lit(0L))
    val localW = Window.partitionBy(col("__go_pid")).orderBy(sortCols: _*)
    ranged
      .withColumn(rnCol, row_number().over(localW).cast("long") + offExpr)
      .drop("__go_pid")
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
    * prefix-summed per group in partition order, and joined back as a
    * broadcast offsets table. Exact and deterministic when sortCols totally
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
    // ≤ groups×P rows of (pid, group..., count) — partition-count-bounded
    val counts = ranged
      .groupBy(col("__go_pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__go_n"))
      .collect()
    // per-group prefix offsets in pid order + per-group totals (no ordering
    // needed ACROSS groups — only pid order within each group key)
    val byGroup = counts.groupBy(r => groupCols.indices.map(i => r.get(i + 1)).toIndexedSeq)
    val offRows = byGroup.toSeq.flatMap { case (gvals, rs) =>
      val sorted = rs.sortBy(_.getInt(0))
      val total = sorted.map(_.getLong(groupCols.size + 1)).sum
      sorted.map(_.getInt(0))
        .zip(sorted.scanLeft(0L)(_ + _.getLong(groupCols.size + 1)))
        .map { case (pid, off) =>
          org.apache.spark.sql.Row.fromSeq(pid +: gvals ++: Seq(off, total))
        }
    }
    val gFields = groupCols.map(n => ranged.schema(n))
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__go_pid", org.apache.spark.sql.types.IntegerType) +:
        gFields ++:
        Seq(
          org.apache.spark.sql.types.StructField("__go_off", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(cntCol, org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(offRows).asJava),
      offSchema)
    val localW = Window
      .partitionBy((col("__go_pid") +: groupCols.map(col)): _*)
      .orderBy(sortCols: _*)
    ranged
      .join(broadcast(offDf), "__go_pid" +: groupCols, "left_outer")
      .withColumn(rnCol, row_number().over(localW).cast("long") + coalesce(col("__go_off"), lit(0L)))
      .drop("__go_pid", "__go_off")
  }

  /** Adds `runCol` = exact per-group RUNNING SUM of `measure` under
    * `sortCols`, plus `totCol` = the group's total — the prefix-sum
    * generalization of [[withGroupedRowNumber]] (which is the special case
    * `measure = 1`). Same scale mechanics: range shuffle over
    * (groupCols ++ sortCols) spreads a low-cardinality group across many
    * partitions; the per-(group, partition) partial sums (≤ groups×P tiny
    * rows) collect to the driver, prefix-sum per group in partition order,
    * and broadcast back as offsets added to each partition's local window
    * sum. This is the distributed form of cumulative weight / running
    * revenue over massive skewed groups — never a whole-group single task.
    *
    * Exactness: driver and window arithmetic follow `sum(measure)`'s Spark
    * type; pass an exact type (decimal / integral) for order-free,
    * oracle-exact prefix sums. Rows where `measure` is null contribute
    * nothing (SQL SUM semantics) but still receive the running value.
    */
  def withGroupedRunningSum(
      df: DataFrame,
      runCol: String,
      totCol: String,
      measure: Column,
      groupCols: Seq[String],
      sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val rangeCols = groupCols.map(col) ++ sortCols
    val ranged = df
      .withColumn("__go_m", measure)
      .repartitionByRange(p, rangeCols: _*)
      .withColumn("__go_pid", spark_partition_id())
      .localCheckpoint()
    val partials = ranged
      .groupBy(col("__go_pid") +: groupCols.map(col): _*)
      .agg(sum(col("__go_m")).as("__go_s"))
    val sType = partials.schema("__go_s").dataType
    val zero: Any = sType match {
      case _: org.apache.spark.sql.types.DecimalType => java.math.BigDecimal.ZERO
      case org.apache.spark.sql.types.LongType => 0L
      case org.apache.spark.sql.types.IntegerType => 0
      case org.apache.spark.sql.types.FloatType => 0.0f
      case _ => 0.0
    }
    def plus(a: Any, b: Any): Any = (a, b) match {
      case (x, null) => x
      case (null, y) => y
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case (x: Long, y: Long) => x + y
      case (x: Int, y: Int) => x + y
      case (x: Float, y: Float) => x + y
      case (x: Double, y: Double) => x + y
      case (x, y) => throw new IllegalArgumentException(s"unsupported measure sum: $x + $y")
    }
    val counts = partials.collect()
    val gN = groupCols.size
    val byGroup = counts.groupBy(r => groupCols.indices.map(i => r.get(i + 1)).toIndexedSeq)
    val offRows = byGroup.toSeq.flatMap { case (gvals, rs) =>
      val sorted = rs.sortBy(_.getInt(0))
      val total = sorted.map(_.get(gN + 1)).foldLeft(zero)(plus)
      sorted.map(_.getInt(0))
        .zip(sorted.scanLeft(zero)((acc, r) => plus(acc, r.get(gN + 1))))
        .map { case (pid, off) =>
          org.apache.spark.sql.Row.fromSeq(pid +: gvals ++: Seq(off, total))
        }
    }
    val gFields = groupCols.map(n => ranged.schema(n))
    val offSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__go_pid", org.apache.spark.sql.types.IntegerType) +:
        gFields ++:
        Seq(
          org.apache.spark.sql.types.StructField("__go_off", sType),
          org.apache.spark.sql.types.StructField(totCol, sType)))
    val offDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(offRows).asJava),
      offSchema)
    val localW = Window
      .partitionBy((col("__go_pid") +: groupCols.map(col)): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .join(broadcast(offDf), "__go_pid" +: groupCols, "left_outer")
      .withColumn(runCol,
        coalesce(sum(col("__go_m")).over(localW), lit(0).cast(sType)) +
          coalesce(col("__go_off"), lit(0).cast(sType)))
      .drop("__go_pid", "__go_off", "__go_m")
  }
}
