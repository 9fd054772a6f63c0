package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** J1 — the reference's upsert/MERGE on `cotuid`
  * (`/root/reference/task.ts:235-350`): per source row, no target match →
  * insert; match → update carrying the target's identity columns. The
  * reference probes the sink once per row (≤2 HTTP round-trips/feature);
  * here the whole batch is one left-outer join split, broadcastable when
  * either side is small, and the same code runs inside `foreachBatch` for
  * the streaming path.
  *
  * Scale: one shuffle on the key (or zero if the source is broadcast);
  * idempotent on the key → at-least-once delivery upstream still yields
  * exactly-once sink state, as in SURVEY.md §2.8.
  */
object Merge {

  /** First-match in-batch dedup (reference A2 `query.features[0]`,
    * `task.ts:284,316`): keep one row per key, ordered by `orderCols`.
    */
  def dedupFirst(df: DataFrame, key: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Upsert `source` into `target` on `key`, returning the merged state with
    * a `merge_action` column ('updated' | 'kept' | 'inserted').
    *
    * - columns present in both: source value wins on match (update)
    * - target-only columns: preserved on update, null on insert (callers
    *   apply P2 defaults, e.g. [[FeatureOps.insertDefaults]])
    * - `PRESERVE_HISTORY` append mode (reference `task.ts:235-265`) is
    *   [[append]] instead.
    */
  def upsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val overlap = (source.columns.toSet - key).intersect(target.columns.toSet)
    val updated = target.alias("t")
      .join(source.alias("s"), col(s"t.$key") === col(s"s.$key"))
      .select(
        target.columns.map { c =>
          if (overlap(c)) col(s"s.$c").as(c) else col(s"t.$c").as(c)
        }.toSeq: _*
      )
      .withColumn("merge_action", lit("updated"))
    val kept = target
      .join(source.select(col(key)), Seq(key), "left_anti")
      .withColumn("merge_action", lit("kept"))
    val srcOnly = source.join(target.select(col(key)), Seq(key), "left_anti")
    val inserted = srcOnly
      .select(
        target.columns.map { c =>
          if (srcOnly.columns.contains(c)) col(c)
          else lit(null).cast(target.schema(c).dataType).as(c)
        }.toSeq: _*
      )
      .withColumn("merge_action", lit("inserted"))
    updated.unionByName(kept).unionByName(inserted)
  }

  /** Append-only mode (`PRESERVE_HISTORY=true`, reference `task.ts:36-39`,
    * v7.10.0 "continuous insert mode"): no key lookup, pure union.
    */
  def append(target: DataFrame, source: DataFrame): DataFrame = {
    val withCols = target.columns.map { c =>
      if (source.columns.contains(c)) col(c)
      else lit(null).cast(target.schema(c).dataType).as(c)
    }
    target.unionByName(source.select(withCols.toSeq: _*))
  }
}
