package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Schema drift (SURVEY.md §7.4): ArcGIS layers add/remove fields over a
  * connector's lifetime (the reference wraps dynamic properties opaquely,
  * task.ts:429-431 — our T2 nestMetadata twin). For the lake-side story the
  * engine must also read a parquet directory whose files were written under
  * DIFFERENT schema versions: mergeSchema unions them and back-fills nulls.
  */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("mergeSchema unions drifted file schemas; old files read nulls for new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-drift").toString
    // v1 of the layer: (id, name)
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/t/part=v1")
    // v2 added a score column
    Seq((3L, "c", 9.5), (4L, "d", 7.25)).toDF("id", "name", "score")
      .write.parquet(s"$dir/t/part=v2")

    val df = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(df.columns.toSet == Set("id", "name", "score", "part"))
    val rows = df.select(col("id"), col("score")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9.5), 4L -> Some(7.25)))

    // aggregation over the drifted column treats missing as absent, not zero
    val agg = df.agg(count(col("score")), sum(col("score")).cast("double")).head()
    assert(agg.getLong(0) == 2L && agg.getDouble(1) == 16.75)
  }

  test("explicit schema projection reads old files with back-filled nulls (no merge pass)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-drift2").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/t")
    // a reader pinned to the NEW schema still reads v1 files
    val newSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, score DOUBLE")
    val df = spark.read.schema(newSchema).parquet(s"$dir/t")
    val r = df.head()
    assert(r.getLong(0) == 1L && r.getString(1) == "a" && r.isNullAt(2))
  }
}
