package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AmsSketch, Salting}

/** Contracts for the AMS F2 sketch (x38/x39's kernel): sign parity against
  * an independent Scala spelling, shard-merge additivity, exact estimate
  * arithmetic on a hand-computable frame, and the adaptive salt width's
  * response to skew (grows on a hot-key frame, collapses to 1 on uniform,
  * clamps at 64).
  */
class AmsSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hashed(keys: Seq[Long]) =
    keys.toDF("k").select(((lit(2654435761L) * col("k") + lit(12345L)) % AmsSketch.P).as("h"))

  private def expectedSign(t: Long, i: Int): Long = {
    import AmsSketch.{M0, M1, M2, M3, P}
    val t2 = (t * t) % P
    val h = (M3 * ((t2 * t) % P) + M2 * t2 + M1 * t + M0) % P
    val h2 = (h * h) % P
    val h3 = (h2 * h) % P
    1L - 2L * (((AmsSketch.RowA(i) * h3 + AmsSketch.RowB(i) * h2 +
      AmsSketch.RowC(i) * h + AmsSketch.RowD(i)) % P) % 2L)
  }

  test("sign columns match the independent degree-3 Scala spelling, and signs are ±1") {
    val hs = Seq(0L, 1L, 7L, 12345L, 999999999L, AmsSketch.P - 1)
    val got = AmsSketch
      .bucketize(hs.toDF("h"), col("h"), col("h"))
      .select(col("h"), col("row_i"), col("sign"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    for (h <- hs; i <- 0 until AmsSketch.DefaultRows) {
      val expected = expectedSign(h, i)
      assert(got((h, i)) == expected, s"sign mismatch at h=$h row=$i")
      assert(expected == 1L || expected == -1L)
    }
  }

  test("sketches of disjoint shards merge by adding Z_i (union = sum)") {
    val a = (1L to 400L) ++ (1L to 100L) // keys with repeats
    val b = (200L to 900L).map(k => k % 37L)
    def zs(keys: Seq[Long]) =
      AmsSketch.sums(AmsSketch.bucketize(hashed(keys), col("h")))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val za = zs(a)
    val zb = zs(b)
    val zu = zs(a ++ b)
    for (i <- 0 until AmsSketch.DefaultRows)
      assert(zu(i) == za(i) + zb(i), s"row $i: union Z != sum of shard Zs")
  }

  test("estimate reproduces the hand-computed mean and median-of-means exactly") {
    val keys = (1L to 50L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val hs = keys.map(k => (2654435761L * k + 12345L) % AmsSketch.P)
    val z = Array.fill(AmsSketch.DefaultRows)(0L)
    for (h <- hs; i <- 0 until AmsSketch.DefaultRows)
      z(i) += expectedSign(h, i)
    val gs = z.map(v => v * v).grouped(AmsSketch.GroupSize).map(_.sum).toArray.sorted
    val expMean = z.map(v => v * v).sum.toDouble / AmsSketch.DefaultRows
    val expMom = (gs(1) + gs(2)).toDouble / (2 * AmsSketch.GroupSize)
    val row = AmsSketch
      .estimate(AmsSketch.sums(AmsSketch.bucketize(hashed(keys), col("h"))))
      .collect().head
    assert(row.getAs[Double]("est_mean") == expMean)
    assert(row.getAs[Double]("est_mom") == expMom)
    assert(row.getAs[Long]("est_mom_i") == (gs(1) + gs(2)) / (2 * AmsSketch.GroupSize))
  }

  test("estimateR scales to the sketch's actual row count (8-row sketch)") {
    // the latent bug estimateR retires: estimate() assumed 16 rows, so an
    // 8-row sketch frame got est_mean halved and est_mom read missing
    // group slots. Hand-compute the 8-row truth and demand exact equality.
    val rows = 8
    val keys = (1L to 60L).flatMap(k => Seq.fill((k % 4 + 1).toInt)(k))
    val hs = keys.map(k => (2654435761L * k + 12345L) % AmsSketch.P)
    val z = Array.fill(rows)(0L)
    for (h <- hs; i <- 0 until rows) z(i) += expectedSign(h, i)
    val gs = z.map(v => v * v).grouped(AmsSketch.GroupSize).map(_.sum).toArray.sorted
    val expMean = z.map(v => v * v).sum.toDouble / rows
    val expMom = (gs(0) + gs(1)).toDouble / (2 * AmsSketch.GroupSize) // 2 groups: median = their mean
    val row = AmsSketch
      .estimateR(AmsSketch.sums(AmsSketch.bucketizeR(hashed(keys), col("h"), rows)), rows)
      .collect().head
    assert(row.getAs[Double]("est_mean") == expMean)
    assert(row.getAs[Double]("est_mom") == expMom)
    assert(row.getAs[Long]("est_mom_i") == (gs(0) + gs(1)) / (2 * AmsSketch.GroupSize))
  }

  test("estimateR rejects widths the median-of-means layout can't honor") {
    val sums = AmsSketch.sums(AmsSketch.bucketize(hashed(Seq(1L, 2L)), col("h")))
    intercept[IllegalArgumentException](AmsSketch.estimateR(sums, 12)) // not a power of two
    intercept[IllegalArgumentException](AmsSketch.estimateR(sums, 2)) // not a multiple of GroupSize
  }

  test("degree-3 signs estimate within 2x of exact F2 on consecutive integer keys") {
    // consecutive keys are the adversarial case: parity of an AFFINE map
    // correlates across them and underestimated F2 ~5x; the degree-3
    // family must hold the 2x envelope here (deterministic given the
    // fixed coefficients)
    val keys = (1L to 3000L).flatMap(k => Seq.fill(((k * 7) % 5 + 1).toInt)(k))
    val exact = keys.groupBy(identity).map { case (_, v) => v.size.toLong * v.size }.sum
    val row = AmsSketch
      .estimate(AmsSketch.sums(AmsSketch.bucketize(hashed(keys), col("h"))))
      .collect().head
    val mom = row.getAs[Double]("est_mom")
    val mean = row.getAs[Double]("est_mean")
    assert(mom * 2 >= exact && mom <= exact * 2, s"est_mom=$mom exact=$exact")
    assert(mean * 2 >= exact && mean <= exact * 2, s"est_mean=$mean exact=$exact")
  }

  private def derivedSalts(keys: Seq[Long]): Long = {
    val df = keys.toDF("k")
    val estI = AmsSketch
      .estimate(AmsSketch.sums(AmsSketch.bucketize(
        df.select(((lit(2654435761L) * col("k") + lit(12345L)) % AmsSketch.P).as("h")),
        col("h"))))
      .select(col("est_mom_i"))
    AmsSketch.saltWidth(estI, df.agg(count(lit(1)).as("n")))
      .collect().head.getLong(0)
  }

  test("saltWidth: 1 on uniform keys, grows with a hot key, clamps at 64") {
    val uniform = (0L until 4000L).map(_ % 1000L) // 1000 keys x 4 — sigma ~ 32/1000
    assert(derivedSalts(uniform) == 1L, "uniform keys must derive no salting")

    // one key holds half the rows: sigma >= p^2*parts = 0.25*32 = 8
    val hot = Seq.fill(4000)(7L) ++ (0L until 4000L).map(_ % 1000L)
    val w = derivedSalts(hot)
    assert(w >= 4L && w <= 32L, s"hot-key frame derived n_salts=$w, expected several")

    // every row the same key: sigma ~ parts -> full spread, within clamp
    val solo = Seq.fill(5000)(42L)
    val ws = derivedSalts(solo)
    assert(ws >= 16L && ws <= 64L, s"single-key frame derived n_salts=$ws")
  }

  test("the derived salt width actually SPREADS the hot key across reducers") {
    // the point of salting, asserted deterministically: partition the
    // probe by (key, salt) the way the join's exchange does and count how
    // many reducer partitions the hot key's rows land on — ~n_salts with
    // the derived width, exactly 1 without it
    val probe = (Seq.fill(6000)(7L) ++ (0L until 2000L).map(_ % 500L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "uid")
    val estI = AmsSketch
      .estimate(AmsSketch.sums(AmsSketch.bucketize(
        probe.select(((lit(2654435761L) * col("k") + lit(12345L)) % AmsSketch.P).as("h")),
        col("h"))))
      .select(col("est_mom_i"))
    val saltRow = AmsSketch.saltWidth(estI, probe.agg(count(lit(1)).as("n")))
    val nSalts = saltRow.collect().head.getLong(0)
    assert(nSalts >= 8L, s"75%-hot frame must derive a wide spread, got $nSalts")
    val salted = probe
      .crossJoin(broadcast(saltRow))
      .withColumn("__salt", pmod(xxhash64(col("uid")), col("__nsalts")))
      .repartition(32, col("k"), col("__salt"))
      .withColumn("pid", spark_partition_id())
    val hotParts = salted.filter(col("k") === 7L)
      .select(col("pid")).distinct().count()
    val unsaltedParts = probe.repartition(32, col("k"))
      .withColumn("pid", spark_partition_id())
      .filter(col("k") === 7L).select(col("pid")).distinct().count()
    assert(unsaltedParts == 1L, "without salting the hot key funnels into one reducer")
    assert(hotParts >= nSalts / 2, s"hot key landed on only $hotParts partitions for $nSalts salts")
  }

  test("saltedJoinHotDyn equals the plain join on a skewed frame") {
    val probe = (Seq.fill(3000)(7L) ++ (0L until 2000L).map(_ % 400L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "uid")
    val build = (0L until 1000L).map(k => (k, s"v$k")).toDF("k", "payload")
    val estI = AmsSketch
      .estimate(AmsSketch.sums(AmsSketch.bucketize(
        probe.select(((lit(2654435761L) * col("k") + lit(12345L)) % AmsSketch.P).as("h")),
        col("h"))))
      .select(col("est_mom_i"))
    val saltRow = AmsSketch.saltWidth(estI, probe.agg(count(lit(1)).as("n")))
    val salted = Salting.saltedJoinHotDyn(probe, build, Seq("k"), saltRow)
      .select(col("k"), col("uid"), col("payload"))
    val plain = probe.join(build, Seq("k")).select(col("k"), col("uid"), col("payload"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join must compute exactly the plain join")
  }
}
