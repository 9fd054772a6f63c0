package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression conversions for
  * graft's custom Catalyst expressions (e.g. [[graft.functions.MercatorX]]).
  * Lives in the spark.sql package solely to widen access — the standard
  * pattern for third-party Catalyst extensions.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The physical plan's RDD of catalyst rows — the encoder-free twin of
    * `Dataset.rdd` (which compiles a per-schema deserializer and boxes every
    * row into external objects). Rows may be reused by the upstream iterator;
    * callers must not buffer them without `copy()`.
    */
  def toInternalRdd(df: Dataset[Row]): org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd

  /** Block until every event already posted to the listener bus has been
    * delivered (`listenerBus` is `private[spark]`). Measurement tools that
    * read state a [[org.apache.spark.scheduler.SparkListener]] accumulates
    * (e.g. the test-side QueryProfile) need this barrier before reading:
    * stage-completed events arrive on the bus thread, typically AFTER the
    * action's driver-side return.
    */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType
  ): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
