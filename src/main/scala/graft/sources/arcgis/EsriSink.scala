package graft.sources.arcgis

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Outgoing writers against an ArcGIS layer (SURVEY.md §2.1 S7-S10) —
  * the reference's `addFeatures`/`updateFeatures`/existence-probe flow
  * (`/root/reference/task.ts:236-349`) restructured for batch scale:
  *
  *   - The per-row existence probe (≤2 HTTP round-trips per feature,
  *     `task.ts:267-284`) becomes ONE parallel scan of the target's keys via
  *     the DSv2 source + a left join — O(batch) requests instead of O(rows).
  *   - Writes are batched per partition (`foreachPartition`), with
  *     per-feature error isolation: a failed row is logged and counted, the
  *     batch continues (reference T8, `task.ts:351-358`).
  *   - Append mode (`PRESERVE_HISTORY=true`, `task.ts:235-265`) skips the
  *     key scan entirely.
  */
object EsriSink {

  private def toEsriFeature(row: Row, cols: Seq[String]): EsriFeature = {
    val attrs = cols.flatMap { c =>
      if (c == "geom_x" || c == "geom_y") None
      else Option(row.getAs[Any](c)).map(c -> _)
    }.toMap
    val geom =
      if (cols.contains("geom_x") && row.getAs[Any]("geom_x") != null)
        Some((row.getAs[Number]("geom_x").doubleValue(),
          row.getAs[Number]("geom_y").doubleValue()))
      else None
    EsriFeature(attrs, geom)
  }

  /** Append-only write (S8; PRESERVE_HISTORY mode). Returns (ok, failed). */
  def append(df: DataFrame, clientKey: String): (Long, Long) = {
    val spark = df.sparkSession
    val ok = spark.sparkContext.longAccumulator("esri_add_ok")
    val bad = spark.sparkContext.longAccumulator("esri_add_failed")
    val cols = df.columns.toSeq
    df.foreachPartition { (it: Iterator[Row]) =>
      val client = ArcGisClientRegistry.get(clientKey)
      it.grouped(500).foreach { batch =>
        val results = client.addFeatures(batch.map(toEsriFeature(_, cols)))
        results.foreach {
          case Right(_) => ok.add(1)
          case Left(_) => bad.add(1) // T8: log-and-continue, never fail the job
        }
      }
    }
    (ok.value, bad.value)
  }

  /** Upsert write (J1 against the external layer): one key scan + join split
    * into add/update batches. Returns (inserted, updated).
    */
  def upsert(df: DataFrame, clientKey: String, keyCol: String): (Long, Long) = {
    val spark = df.sparkSession
    // One parallel scan of (key, objectid) from the target layer — replaces
    // the reference's per-row `/query?where=cotuid='id'` probe (S10).
    val targetKeys = spark.read
      .format("arcgis")
      .option("client", clientKey)
      .load()
      .select(col(keyCol), col("objectid"))

    // No broadcast hint: the target layer's key set scales with the sink, so
    // the planner/AQE must choose (broadcast when small, shuffle join at scale).
    val annotated = df.join(targetKeys, Seq(keyCol), "left_outer")

    val inserted = append(annotated.filter(col("objectid").isNull).drop("objectid"), clientKey)
    val updates = annotated.filter(col("objectid").isNotNull)

    val okU = spark.sparkContext.longAccumulator("esri_update_ok")
    val badU = spark.sparkContext.longAccumulator("esri_update_failed")
    val cols = updates.columns.toSeq
    updates.foreachPartition { (it: Iterator[Row]) =>
      val client = ArcGisClientRegistry.get(clientKey)
      it.grouped(500).foreach { batch =>
        client.updateFeatures(batch.map(toEsriFeature(_, cols))).foreach {
          case Right(_) => okU.add(1)
          case Left(_) => badU.add(1)
        }
      }
    }
    (inserted._1, okU.value)
  }

  /** Bulk tombstone delete (the DataFrame-level twin of the DSv2 writer's
    * `_deleted` routing): resolves target OIDs with the same ONE parallel
    * key-scan join the upsert uses — never a per-row probe — and posts
    * batched `deleteFeatures`. Keys absent from the target are idempotent
    * no-ops (dropped by the inner join). Returns (deleted, failed).
    */
  def delete(df: DataFrame, clientKey: String, keyCol: String): (Long, Long) = {
    val spark = df.sparkSession
    val targetKeys = spark.read
      .format("arcgis")
      .option("client", clientKey)
      .load()
      .select(col(keyCol), col("objectid"))
    val oids = df.select(col(keyCol)).distinct()
      .join(targetKeys, Seq(keyCol))
      .select(col("objectid"))
    val ok = spark.sparkContext.longAccumulator("esri_delete_ok")
    val bad = spark.sparkContext.longAccumulator("esri_delete_failed")
    oids.foreachPartition { (it: Iterator[Row]) =>
      val client = ArcGisClientRegistry.get(clientKey)
      it.grouped(500).foreach { batch =>
        client.deleteFeatures(batch.map(_.getAs[Number]("objectid").longValue())).foreach {
          case Right(_) => ok.add(1)
          case Left(_) => bad.add(1)
        }
      }
    }
    (ok.value, bad.value)
  }
}
