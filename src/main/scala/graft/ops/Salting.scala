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

  /** Skew-ADAPTIVE salted join. [[saltedJoin]] replicates the ENTIRE build
    * side nSalts times — nSalts× build shuffle volume, ruinous at 100 TB
    * when skew is really a handful of keys. This variant detects hot keys
    * from a deterministic hash-sample of the probe side (1/sampleRate of
    * rows — no rand(), stable across task retries) and salts ONLY those:
    * cold keys keep salt 0 on both sides (no replication), hot keys spread
    * over nSalts reducers with the matching build rows replicated. The hot
    * set is ≤ 1/hotFraction keys by construction, so it broadcasts.
    *
    * Result is identical to `probe.join(build, keys)` for any hot set —
    * the x1 oracle certifies this cell-exactly.
    */
  def saltedJoinHot(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      saltFrom: String,
      nSalts: Int,
      sampleRate: Int = 64,
      hotFraction: Double = 0.01
  ): DataFrame = {
    val keyCols = keys.map(col)
    // sample hash spans keys + saltFrom: hashing saltFrom ALONE makes the
    // "1/sampleRate sample" all-or-nothing per saltFrom value when that
    // column is low-cardinality (e.g. l_linenumber: 7 values → typically an
    // EMPTY sample and hot detection never fires). keys+saltFrom is
    // near-unique per row, so the filter is a genuine row subset.
    val sampled = probe
      .filter(pmod(xxhash64(keyCols :+ col(saltFrom): _*), lit(sampleRate)) === 0)
      .select(keyCols: _*)
    val hot = sampled
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(sampled.agg(count(lit(1)).as("__tot"))))
      .filter(col("__cnt") > col("__tot") * hotFraction)
      .select(keyCols: _*)
      .withColumn("__hot", lit(true))
    val probeS = probe
      .join(broadcast(hot), keys, "left")
      .withColumn(
        "__salt",
        when(col("__hot"), pmod(xxhash64(col(saltFrom)), lit(nSalts))).otherwise(lit(0L))
      )
      .drop("__hot")
    val salts = array((0 until nSalts).map(i => lit(i.toLong)): _*)
    val buildS = build
      .join(broadcast(hot), keys, "left")
      .withColumn("__salt", explode(when(col("__hot"), salts).otherwise(array(lit(0L)))))
      .drop("__hot")
    probeS.join(buildS, keys :+ "__salt").drop("__salt")
  }

  /** [[saltedJoinHot]] with the salt width derived IN-PLAN (the d29/s22/x35
    * adaptive-rule): `nSaltsRow` is a broadcast one-row frame carrying
    * `__nsalts` — typically [[AmsSketch.saltWidth]]'s skew-driven power of
    * two — so the spread factor tracks MEASURED key skew instead of a
    * human-pinned constant. Uniform corpora get `__nsalts = 1` (no
    * replication anywhere); a hot-key corpus widens automatically. Result
    * is identical to `probe.join(build, keys)` for any salt width — the
    * x39 oracle certifies this cell-exactly.
    */
  def saltedJoinHotDyn(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      saltFrom: String,
      nSaltsRow: DataFrame,
      sampleRate: Int = 64,
      hotFraction: Double = 0.01
  ): DataFrame = {
    val keyCols = keys.map(col)
    // same keys+saltFrom sample hash as saltedJoinHot (see comment there)
    val sampled = probe
      .filter(pmod(xxhash64(keyCols :+ col(saltFrom): _*), lit(sampleRate)) === 0)
      .select(keyCols: _*)
    val hot = sampled
      .groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
      .crossJoin(broadcast(sampled.agg(count(lit(1)).as("__tot"))))
      .filter(col("__cnt") > col("__tot") * hotFraction)
      .select(keyCols: _*)
      .withColumn("__hot", lit(true))
    val probeS = probe
      .join(broadcast(hot), keys, "left")
      .crossJoin(broadcast(nSaltsRow))
      .withColumn(
        "__salt",
        when(col("__hot"), pmod(xxhash64(col(saltFrom)), col("__nsalts"))).otherwise(lit(0L))
      )
      .drop("__hot", "__nsalts")
    val buildS = build
      .join(broadcast(hot), keys, "left")
      .crossJoin(broadcast(nSaltsRow))
      .withColumn(
        "__salt",
        explode(when(col("__hot"), sequence(lit(0L), col("__nsalts") - 1))
          .otherwise(array(lit(0L))))
      )
      .drop("__hot", "__nsalts")
    probeS.join(buildS, keys :+ "__salt").drop("__salt")
  }
}
