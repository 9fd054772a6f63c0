package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and reads
  * parquet from that directory. At 100 TB these would be partitioned/bucketed
  * table scans behind a catalog; the parquet reader path (vectorized scan,
  * predicate pushdown, column pruning) is identical.
  */
object Tables {
  /** Catalog-style DataFrame cache: a real engine resolves a table once per
    * session, not once per query — repeated `spark.read.parquet` calls each
    * re-list files and re-read footers for schema inference, which at 90
    * queries x several tables is pure planning overhead. Keyed by session
    * identity so concurrent test sessions don't share plans.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent(
      (spark, s"$sfDir/$name.parquet"),
      { case (s, path) => s.read.parquet(path) }
    )

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.parquet` has shipped `ts` under two encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's reader only surfaces as a
    * raw long (spark.sql.legacy.parquet.nanosAsLong=true, set by
    * Verify/Bench/tests) — and no-timezone `timestamp[us]`, which Spark reads
    * as TIMESTAMP_NTZ. Normalize BOTH to microsecond TimestampType here so
    * every downstream consumer (window functions, `session_window`,
    * `Row.getTimestamp`) sees exactly one timestamp type regardless of the
    * parquet encoding. The NTZ cast is a session-UTC reinterpretation (the
    * test harness pins spark.sql.session.timeZone=UTC), so parquet values
    * compare identically before and after.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TimestampType cast reinterprets wall-clock time in
        // spark.sql.session.timeZone; it is value-preserving ONLY under
        // UTC. Fail loudly rather than silently shift every timestamp for
        // a consumer that builds a session without the pin.
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(
          tz == "UTC" || tz == "Etc/UTC" || tz == "GMT" || tz == "Z",
          s"Tables.events: reading TIMESTAMP_NTZ parquet requires " +
            s"spark.sql.session.timeZone=UTC (got '$tz'); the NTZ->TIMESTAMP cast " +
            "would silently shift values in any other zone")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
