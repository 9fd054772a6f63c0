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
    * `saltFrom` should be high-cardinality (ideally row-unique, e.g. a
    * sequence column): the salt can only take as many values as `saltFrom`
    * has distinct values. The adaptive variants below have no such
    * constraint — they hash every column.
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

  /** Exact heavy hitters of `df` over `keys`: every key whose row share
    * strictly exceeds `hotFraction`, tagged `__hot = true` for the left
    * joins below. Detection is a map-side-combined `groupBy(keys).count`:
    * the shuffle carries one (key, count) pair per distinct key per map
    * partition — keys only, no payload, strictly less volume than the row
    * shuffle of any join this feeds — and the hot set is ≤ 1/hotFraction
    * rows by construction, so it always broadcasts. The total-row frame
    * re-aggregates the same counts subtree, so ReuseExchange serves both
    * branches from one shuffle.
    *
    * Exact counting replaced a hash-SAMPLE detector here: sampling rows by
    * `pmod(xxhash64(keys :+ saltFrom), rate) === 0` selects distinct
    * (keys, saltFrom) COMBOS, not rows — a hot key with fewer distinct
    * combos than the sample rate (the x39 shape: 7-valued l_linenumber
    * under one hot orderkey at rate 64) is detected with probability
    * ≈ 1-(1-1/rate)^combos (~10%), silently leaving the mitigation a
    * no-op. Heavy-hitter detection must aggregate key frequencies, never
    * sample row identities that a hot key collapses.
    */
  def hotKeys(df: DataFrame, keys: Seq[String], hotFraction: Double): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__cnt"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("__cnt")).as("__tot"))))
      .filter(col("__cnt") > col("__tot") * hotFraction)
      .select(keyCols: _*)
      .withColumn("__hot", lit(true))
  }

  /** Deterministic per-row salt in [0, nSalts): xxhash64 over EVERY column
    * of `df` (or over `saltFrom` alone when the caller designates one), so
    * the spread is not capped by any single column's cardinality (hashing a
    * 7-valued l_linenumber alone caps the hot key at ≤ 7 uneven buckets no
    * matter how wide nSalts is). Stable across task retries — no rand() —
    * which is the determinism exactly-once sinks need; the cost is that
    * EXACT duplicate rows share a bucket, the best any deterministic
    * function of row content can do. When a hot key's rows ARE exact
    * duplicates (a common real-world skew pathology), pass a row-unique
    * `saltFrom` column (e.g. a sequence id) so the salt spreads anyway.
    */
  private def rowSalt(df: DataFrame, saltFrom: Option[String]) =
    saltFrom match {
      case Some(c) => xxhash64(col(c))
      case None => xxhash64(df.columns.map(col): _*)
    }

  /** Skew-ADAPTIVE salted join. [[saltedJoin]] replicates the ENTIRE build
    * side nSalts times — nSalts× build shuffle volume, ruinous at 100 TB
    * when skew is really a handful of keys. This variant detects hot keys
    * EXACTLY via [[hotKeys]] (a keys-only map-side-combined count — cheaper
    * than the join's own row shuffle) and salts ONLY those: cold keys keep
    * salt 0 on both sides (no replication), hot keys spread over nSalts
    * reducers with the matching build rows replicated.
    *
    * Result is identical to `probe.join(build, keys)` for any hot set —
    * the x1 oracle certifies this cell-exactly.
    *
    * CAVEAT: the default salt hashes row CONTENT, so a hot key whose rows
    * are exact duplicates collapses into one bucket and the mitigation
    * no-ops; pass a row-unique `saltFrom` column (sequence id, offset) to
    * spread duplicates too.
    */
  def saltedJoinHot(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      nSalts: Int,
      hotFraction: Double = 0.01,
      saltFrom: Option[String] = None
  ): DataFrame = {
    val hot = hotKeys(probe, keys, hotFraction)
    val salt = pmod(rowSalt(probe, saltFrom), lit(nSalts.toLong))
    val probeS = probe
      .join(broadcast(hot), keys, "left")
      .withColumn("__salt", when(col("__hot"), salt).otherwise(lit(0L)))
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
    *
    * Same duplicate-row caveat as [[saltedJoinHot]]: pass a row-unique
    * `saltFrom` when hot keys may carry exact duplicate rows.
    */
  def saltedJoinHotDyn(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      nSaltsRow: DataFrame,
      hotFraction: Double = 0.01,
      saltFrom: Option[String] = None
  ): DataFrame = {
    val hot = hotKeys(probe, keys, hotFraction)
    val salt = pmod(rowSalt(probe, saltFrom), col("__nsalts"))
    val probeS = probe
      .join(broadcast(hot), keys, "left")
      .crossJoin(broadcast(nSaltsRow))
      .withColumn("__salt", when(col("__hot"), salt).otherwise(lit(0L)))
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
