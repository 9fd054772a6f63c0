package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic
import org.apache.spark.sql.functions.col
import org.apache.spark.util.sketch.BloomFilter

/** Plan-native bloom pre-filter: `mightContain` yields a boolean Column
  * that is TRUE when `value` is PROBABLY in `build`'s `buildCol` set.
  *
  * Fully lazy and fully distributed — the filter is built by Spark's own
  * [[BloomFilterAggregate]] (the same expression its runtime row-level
  * filtering injects) inside a SCALAR SUBQUERY, so:
  *
  *   - query CONSTRUCTION runs no job: the subquery executes with the main
  *     query, not eagerly on the driver (vs `DataFrameStatFunctions
  *     .bloomFilter`, which is an action);
  *   - the built filter ships to executors once per query through the
  *     subquery-result mechanism (a broadcast-equivalent constant), not as
  *     a closure-captured lambda environment;
  *   - the probe is [[BloomFilterMightContain]] with `doGenCode` — it stays
  *     inside whole-stage codegen and deserializes the filter once per
  *     task, so the scan-side prune costs one xxhash64 + bit test per row.
  *
  * The caller still pairs the probe with an exact join downstream: bloom
  * false positives (rate set by `expectedItems`/`fpp`) are killed there, so
  * results are bit-identical to the unfiltered plan at any sizing.
  */
object BloomProbe {

  /** @param expectedItems capacity the filter is sized for (an UPPER bound
    *   on `build`'s distinct keys — sizing needs no count() action; an
    *   overestimate only costs bits: 1M items at 3% fpp is ~0.9 MiB). */
  def mightContain(
      build: DataFrame,
      buildCol: String,
      value: Column,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftShims.expression(build(buildCol)))),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    val bloomDf = build.select(GraftShims.column(agg).as("__bloom"))
    val sub = ScalarSubquery(
      bloomDf.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed)
    GraftShims.column(
      BloomFilterMightContain(sub, new XxHash64(Seq(GraftShims.expression(value)))))
  }
}
