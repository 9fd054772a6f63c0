package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §2's 100 TB mandate): a salted
  * join spreads a skewed build key across `nSalts` buckets — the classic
  * remedy when one key holds a large fraction of the fact rows and AQE's
  * skew-join splitting isn't available (e.g. non-shuffle stages or
  * pre-Spark-3 sinks).
  *
  * The probe (skewed, large) side gets a random-but-deterministic salt in
  * [0, nSalts); the build side is replicated nSalts times. Join key becomes
  * (key, salt) → the hot key's rows land on nSalts reducers instead of one.
  */
object Salting {

  /** Deterministic salt from row content (stable across retries — important
    * for exactly-once sinks; never use rand() in a restartable job).
    */
  def withSalt(df: DataFrame, saltFrom: String, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(nSalts)))

  /** Replicate the small side across all salt values. */
  def replicate(df: DataFrame, nSalts: Int): DataFrame =
    df.withColumn("__salt", explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))

  /** Salted equi-join: probe gets salted on a unique column, build is
    * replicated; result is identical to `probe.join(build, keys)` but the
    * shuffle spreads each hot key over nSalts partitions.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      saltFrom: String,
      nSalts: Int
  ): DataFrame =
    withSalt(probe, saltFrom, nSalts)
      .join(replicate(build, nSalts), keys :+ "__salt")
      .drop("__salt")
}
