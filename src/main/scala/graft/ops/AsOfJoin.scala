package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — an operator Spark lacks natively, composed from
  * built-ins per the preference order in SURVEY.md §7.3(a): for each left
  * row, attach the latest right row whose timestamp is <= the left row's,
  * within the same key.
  *
  * Implementation: tag + union both sides, one window partitioned by the
  * key ordered by (ts, side) with rights sorting before lefts at equal
  * timestamps (so an exactly-simultaneous right row IS visible, matching
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics), forward-fill the right
  * payload with `last(ignoreNulls)`, keep left rows.
  *
  * Scale: ONE shuffle on the key and a linear pass per partition — no
  * range-condition join (which Spark would execute as a broadcast
  * nested-loop) and no per-key state explosion. This is the plan an
  * engine-native as-of operator would produce.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all its columns)
    * @param right      reference side
    * @param key        equality key column (same name both sides)
    * @param ts         event-time column (same name both sides)
    * @param rightCols  right columns to carry (renamed as given: (src, dst))
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Seq[(String, String)]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select(
        Seq(col(key), col(ts), col("__side")) ++
          leftCols.filterNot(c => c == key || c == ts).map(col) ++
          rightCols.map { case (_, dst) => lit(null).as(dst) }: _*
      )
    val r = right
      .withColumn("__side", lit(0))
      .select(
        Seq(col(key), col(ts), col("__side")) ++
          leftCols.filterNot(c => c == key || c == ts)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rightCols.map { case (src, dst) => col(src).as(dst) }: _*
      )
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightCols.foldLeft(l.unionByName(r)) { case (df, (_, dst)) =>
      df.withColumn(dst, last(col(dst), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
