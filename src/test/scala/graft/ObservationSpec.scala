package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability — the reference logs the obtained-feature count
  * after each run (A1, `/root/reference/task.ts:455`). The Spark-native
  * equivalent is the Observation API: named aggregates computed DURING the
  * action (no second pass over the data), here riding a curation step.
  */
class ObservationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("A1: counts and quality metrics ride the action, no extra pass") {
    val obs = Observation("curation")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val gated = docs
      .observe(
        obs,
        count(lit(1)).as("n_in"),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"),
        max(col("n_chars")).as("max_chars")
      )
      .filter(col("n_chars") >= 100)
    val kept = gated.count()

    val m = obs.get
    val nIn = m("n_in").asInstanceOf[Long]
    val nShort = m("n_short").asInstanceOf[Long]
    assert(nIn > 0 && nShort >= 0)
    // the observed metrics describe the PRE-filter stream: kept + dropped = seen
    assert(kept + nShort == nIn)
    assert(m("max_chars").asInstanceOf[Long] >= 100)
  }
}
