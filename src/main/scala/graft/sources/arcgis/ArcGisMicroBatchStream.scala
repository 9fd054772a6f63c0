package graft.sources.arcgis

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/** Incremental streaming read of an ArcGIS layer:
  * `spark.readStream.format("arcgis")` tails the layer by OBJECTID.
  *
  * The reference re-pulls the whole layer on every scheduled Lambda
  * invocation (`InvocationType.Schedule`, `/root/reference/task.ts:51`) and
  * relies on the downstream upsert to discard what it already saw. The
  * Spark-native form is a micro-batch source whose OFFSET is the highest
  * OBJECTID delivered so far: each trigger asks the layer for its current
  * `max(oid)` (one cheap `outStatistics` probe), and the batch covers
  * `(lastOid, newMax]` as OID-range partitions — the same stateless range
  * requests (and the same halving reader) as the batch `oidRange` scan, so
  * a large catch-up batch fans out across executors instead of one
  * sequential dump.
  *
  * Contract: APPEND tailing. New features (higher OIDs) are delivered
  * exactly once per query (offsets checkpoint with the stream); in-place
  * UPDATES to already-delivered OIDs are not re-delivered — change-tracking
  * layers expose edits as new rows, which this source picks up naturally.
  * The `where` option applies to every batch (server-side, as in batch
  * scans).
  */
class ArcGisMicroBatchStream(
    schema: StructType,
    options: Map[String, String],
    where: String // the scan's effective where: user option + pushed filters
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  private lazy val client = ArcGisClientRegistry.get(options("client"))
  private lazy val info = client.layerInfo()
  private lazy val oidField = info.fields.find(_.esriType == "esriFieldTypeOID").map(_.name)
    .getOrElse(throw new IllegalArgumentException(
      "arcgis streaming requires an esriFieldTypeOID field in the layer metadata"))

  private def statLong(spec: String, outName: String): Option[Long] =
    client.queryStatistics(where, Nil, Seq(StatSpec(spec, oidField, outName)))
      .headOption.flatMap(_.get(outName)).collect { case n: Number => n.longValue() }

  /** Start BEFORE the smallest matching OID (full backfill in batch 1);
    * `startOid` option overrides (e.g. resume-style tailing from a known
    * watermark without a checkpoint).
    */
  override def initialOffset(): Offset = ArcGisOffset(
    options.get("startOid").map(_.toLong)
      .orElse(statLong("min", "__lo").map(_ - 1))
      .getOrElse(Long.MinValue))

  // AvailableNow: pin the target at prepare time so the wrapped trigger
  // drains to a FIXED point and terminates even while writers keep adding
  @volatile private var availableNowTarget: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(liveLatest())

  private def liveLatest(): Offset =
    ArcGisOffset(statLong("max", "__hi").getOrElse(Long.MinValue))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Admission control: `maxOffsetsPerTrigger`-style limits cap the OID
    * span of a batch (an upper bound on rows — OIDs may be sparse, so a
    * capped batch delivers AT MOST that many rows and the remainder arrives
    * in subsequent triggers).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(liveLatest()).asInstanceOf[ArcGisOffset]
    limit match {
      case m: ReadMaxRows =>
        val lo = start.asInstanceOf[ArcGisOffset].maxOid
        ArcGisOffset(math.min(target.maxOid, lo + m.maxRows()))
      case _ => target
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ArcGisOffset].maxOid + 1
    val hi = end.asInstanceOf[ArcGisOffset].maxOid + 1 // exclusive
    if (hi <= lo) Array.empty
    else {
      // same range/page discipline as the batch oidRange planner: pageSize
      // sizes the ranges, the SERVER cap is the saturation threshold
      val page = options.get("pageSize").map(_.toInt).getOrElse(info.maxRecordCount.max(1))
      val saturation = info.maxRecordCount.max(1)
      val n = (((hi - lo) + page - 1) / page).toInt.max(1)
      val width = math.max(1L, (hi - lo + n - 1) / n)
      (0 until n).iterator
        .map { i =>
          val a = lo + i.toLong * width
          ArcGisOidRangePartition(a, math.min(hi, a + width), oidField, where,
            saturation, envelope = None)
        }
        .filter(p => p.lo < p.hi)
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArcGisReaderFactory(schema, options)

  override def deserializeOffset(json: String): Offset = ArcGisOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the stream checkpoint

  override def stop(): Unit = ()
}

/** Highest OBJECTID delivered so far. */
case class ArcGisOffset(maxOid: Long) extends Offset {
  override def json(): String = s"""{"maxOid":$maxOid}"""
}

object ArcGisOffset {
  private val Pattern = """\{"maxOid":(-?\d+)\}""".r
  def fromJson(json: String): ArcGisOffset = json.trim match {
    case Pattern(v) => ArcGisOffset(v.toLong)
    case other => throw new IllegalArgumentException(s"malformed arcgis offset: $other")
  }
}
