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
  * Contract: two incremental modes, selected by the `incremental` option.
  *
  *  - `oid` (default): APPEND tailing. New features (higher OIDs) are
  *    delivered exactly once per query (offsets checkpoint with the
  *    stream); in-place UPDATES to already-delivered OIDs are not
  *    re-delivered — change-tracking layers expose edits as new rows,
  *    which this source picks up naturally.
  *  - `editDate`: CHANGE tailing on the layer's edit-tracking timestamp
  *    (`editDateField` option — the server's `editFieldsInfo.editDateField`,
  *    epoch millis, non-null because ArcGIS stamps it on create AND edit).
  *    The offset is the highest edit timestamp delivered; each batch covers
  *    `editField ∈ (lastTs, serverMaxTs]`, so an in-place edit bumps the
  *    row back into the next window and IS re-delivered. This replicates
  *    what the reference's scheduled full re-pull re-observes
  *    (`/root/reference/task.ts:51` — every invocation re-reads the layer
  *    and lets the downstream upsert reconcile) while transferring only the
  *    changed rows; pair it with the upsert sink/merge (f5/J1) for the same
  *    end state. Each window still fans out as OID-range partitions (the
  *    min/max OID WITHIN the window is probed per batch), so a large
  *    catch-up window parallelizes like a backfill.
  *
  * The `where` option applies to every batch (server-side, as in batch
  * scans). Checkpoints are mode-specific: the stored watermark is an OID in
  * one mode and a timestamp in the other — never resume a checkpoint under
  * the other mode.
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

  private lazy val editMode = options.get("incremental").exists(_.equalsIgnoreCase("editDate"))
  private lazy val editField = options.getOrElse("editDateField",
    throw new IllegalArgumentException(
      "incremental=editDate requires the editDateField option " +
        "(the layer's editFieldsInfo.editDateField, epoch-millis)"))

  /** The column the stream offset tracks: OID in append mode, the edit
    * timestamp in editDate mode.
    */
  private lazy val watermarkField = if (editMode) editField else oidField

  private def statLong(spec: String, field: String, outName: String,
      w: String = where): Option[Long] =
    client.queryStatistics(w, Nil, Seq(StatSpec(spec, field, outName)))
      .headOption.flatMap(_.get(outName)).collect { case n: Number => n.longValue() }

  /** `(where) AND (clause)` with degenerate wheres elided. */
  private def andWhere(clause: String): String =
    if (where.trim.isEmpty || where.trim == "1=1") clause else s"($where) AND ($clause)"

  /** Start BEFORE the smallest matching watermark (full backfill in batch
    * 1); `startOid` / `startEditDate` options override (resume-style tailing
    * from a known watermark without a checkpoint).
    */
  override def initialOffset(): Offset = ArcGisOffset(
    options.get(if (editMode) "startEditDate" else "startOid").map(_.toLong)
      .orElse(statLong("min", watermarkField, "__lo").map(_ - 1))
      .getOrElse(Long.MinValue))

  // AvailableNow: pin the target at prepare time so the wrapped trigger
  // drains to a FIXED point and terminates even while writers keep adding
  @volatile private var availableNowTarget: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(liveLatest())

  private def liveLatest(): Offset =
    ArcGisOffset(statLong("max", watermarkField, "__hi").getOrElse(Long.MinValue))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  /** Admission control: `maxOffsetsPerTrigger`-style limits cap the OID
    * span of a batch (an upper bound on rows — OIDs may be sparse, so a
    * capped batch delivers AT MOST that many rows and the remainder arrives
    * in subsequent triggers). Row limits do NOT apply in editDate mode: the
    * watermark is a timestamp, and a millisecond span bounds no row count
    * (capping it would just shred an old backfill into thousands of
    * near-empty windows) — the whole pending window ships each trigger.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(liveLatest()).asInstanceOf[ArcGisOffset]
    limit match {
      case m: ReadMaxRows if !editMode =>
        val lo = start.asInstanceOf[ArcGisOffset].maxOid
        ArcGisOffset(math.min(target.maxOid, lo + m.maxRows()))
      case _ => target
    }
  }

  /** `[lo, hi)` OID-range partitions under `w` — the batch oidRange
    * planner's discipline: pageSize sizes the ranges, the SERVER cap is the
    * saturation threshold.
    */
  private def oidRangeParts(lo: Long, hi: Long, w: String): Array[InputPartition] = {
    val page = options.get("pageSize").map(_.toInt).getOrElse(info.maxRecordCount.max(1))
    val saturation = info.maxRecordCount.max(1)
    val n = (((hi - lo) + page - 1) / page).toInt.max(1)
    val width = math.max(1L, (hi - lo + n - 1) / n)
    (0 until n).iterator
      .map { i =>
        val a = lo + i.toLong * width
        ArcGisOidRangePartition(a, math.min(hi, a + width), oidField, w,
          saturation, envelope = None)
      }
      .filter(p => p.lo < p.hi)
      .toArray[InputPartition]
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ArcGisOffset].maxOid
    val hi = end.asInstanceOf[ArcGisOffset].maxOid // inclusive
    if (hi <= lo) Array.empty
    else if (!editMode) oidRangeParts(lo + 1, hi + 1, where)
    else {
      // editDate window: filter server-side on the edit span, then fan the
      // WINDOW out over the OID range it actually touches (two cheap stat
      // probes per batch) — a big catch-up window parallelizes like a
      // backfill instead of funneling through one request chain
      val w2 = andWhere(s"$editField > $lo AND $editField <= $hi")
      (statLong("min", oidField, "__lo", w2), statLong("max", oidField, "__hi", w2)) match {
        case (Some(a), Some(b)) => oidRangeParts(a, b + 1, w2)
        case _ => Array.empty // nothing edited in the window
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArcGisReaderFactory(schema, options)

  override def deserializeOffset(json: String): Offset = ArcGisOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the stream checkpoint

  override def stop(): Unit = ()
}

/** Highest watermark delivered so far: an OBJECTID in the default append
  * mode, an epoch-millis edit timestamp under `incremental=editDate` (the
  * JSON field name stays `maxOid` either way — checkpoints are mode-specific
  * and must not be resumed under the other mode).
  */
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
