package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** T8 — per-record error isolation for the parse stage (reference
  * try/catch-per-record, `/root/reference/task.ts:171,351-358`): malformed
  * payloads never fail the job; they land on a bad-record side channel with
  * the raw input preserved for replay.
  *
  * Spark-native: `from_json` in PERMISSIVE mode with a corrupt-record
  * column; the split is two narrow filters over one parse (Catalyst
  * evaluates `from_json` once per row).
  */
object SafeParse {

  /** Parse `jsonCol` against `schema`; returns (good, bad) where bad rows
    * keep the unparseable raw string in `_corrupt_record`.
    */
  def parseJson(
      df: DataFrame,
      jsonCol: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType)
    )
    val parsed = df.withColumn(
      "__parsed",
      from_json(col(jsonCol), withCorrupt, Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record"))
    )
    val good = parsed
      .filter(col("__parsed").isNotNull && col("__parsed._corrupt_record").isNull)
      .select(col("*"), col("__parsed.*"))
      .drop("__parsed", "_corrupt_record")
    val bad = parsed
      .filter(col("__parsed").isNull || col("__parsed._corrupt_record").isNotNull)
      .select(col(jsonCol).as("raw_record"))
    (good, bad)
  }
}
