package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's outgoing flow (SURVEY.md §3.2, `/root/reference/
  * task.ts:155-361`) as a Structured Streaming pipeline: queue records with
  * a JSON body `{xml, geojson}` (S6) → parse → fixed 8-column CoT attribute
  * projection with P2 insert defaults → geometry-type routing (P3) →
  * watermarked dedup on the feature id → `foreachBatch` upsert (J1).
  *
  * The batch twin of every stage is oracle-tested in the query packs; the
  * streaming wrapper is exercised by `CotStreamSpec` with a MemoryStream.
  *
  * Scale: stateless narrow stages until the dedup (state keyed by id,
  * bounded by the `stale` watermark — the reference's CoT expiry column,
  * `task.ts:250`); the sink merge joins only against the micro-batch's keys.
  */
object CotStream {

  /** Queue record body schema: `{xml: string, geojson: {...feature}}`
    * (reference `task.ts:172-175`).
    */
  val bodySchema: StructType = StructType(Seq(
    StructField("xml", StringType),
    StructField("geojson", StructType(Seq(
      StructField("id", StringType),
      StructField("type", StringType),
      StructField("properties", StructType(Seq(
        StructField("callsign", StringType),
        StructField("remarks", StringType),
        StructField("type", StringType),
        StructField("how", StringType),
        StructField("time", StringType),
        StructField("start", StringType),
        StructField("stale", StringType)
      ))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", ArrayType(DoubleType))
      )))
    )))
  ))

  /** S6 + T7: parse raw queue bodies (a `value: string` column) into typed
    * CoT feature rows.
    */
  def parseBodies(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value"), bodySchema).as("body"))
      .select(col("body.geojson.*"))

  /** P1 + P2 (insert branch): project the fixed CoT attribute schema with
    * defaults — `cotuid ← id`, `callsign || 'Unknown'`, `remarks || ''`
    * (reference `task.ts:241-251`), stale parsed as the event-time column.
    */
  def projectCotAttributes(features: DataFrame): DataFrame =
    features.select(
      col("id").as("cotuid"),
      coalesce(col("properties.callsign"), lit("Unknown")).as("callsign"),
      coalesce(col("properties.remarks"), lit("")).as("remarks"),
      col("properties.type").as("cottype"),
      col("properties.how").as("how"),
      to_timestamp(col("properties.time")).as("time"),
      to_timestamp(col("properties.start")).as("start"),
      to_timestamp(col("properties.stale")).as("stale"),
      col("geometry.type").as("gtype"),
      col("geometry.coordinates").as("coordinates")
    )

  /** P4 + P3: drop null geometries, keep only configured sink types
    * (reference routes Point/LineString/Polygon and skips the rest,
    * `task.ts:177-187`).
    */
  def routeConfigured(df: DataFrame, configured: Seq[String]): DataFrame =
    df.filter(col("gtype").isNotNull && col("gtype").isin(configured: _*))

  /** Optional exactly-once dedup (§2.8): watermark on `stale` (the CoT
    * expiry timestamp) bounds dedup state; duplicates within the horizon
    * collapse to the first arrival per `cotuid`.
    *
    * NOT part of [[outgoing]]: cross-batch "duplicates" are exactly the
    * updates the upsert sink must apply (last-write-wins, J1) — stream-level
    * dropDuplicates would swallow them. In-batch duplicates are resolved
    * per-batch inside the merge ([[graft.ops.Merge.dedupFirst]], reference
    * A2 first-match).
    */
  def dedupWithWatermark(df: DataFrame, horizon: String = "1 hour"): DataFrame =
    df.withWatermark("stale", horizon).dropDuplicates("cotuid")

  /** Full outgoing transform chain, minus the sink (which is a
    * `foreachBatch { Merge.upsert(target, Merge.dedupFirst(batch, ...)) }`).
    */
  def outgoing(raw: DataFrame, configured: Seq[String] = Seq("Point", "LineString", "Polygon")): DataFrame =
    routeConfigured(projectCotAttributes(parseBodies(raw)), configured)
}
