package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.HdrSketch

/** Structural contracts for the HDR log-bucket quantile sketch (x32/x33's
  * engine): every value lands inside its bucket's [lo, hi], bucketing is
  * monotone in the value (so cumulative counts over bucket order ARE rank
  * counts), relative bucket width is bounded by 2^-bits, the sketch merges
  * by adding counts, and the rank-r order statistic provably falls in the
  * picked bucket. Values exercise the octave boundaries (2^k - 1, 2^k,
  * 2^k + 1), zero, and Long.MaxValue — the places shift/mask schemes break.
  */
class HdrSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def edgeValues: Seq[Long] = {
    val octaves = (0 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1))
    (Seq(0L, 1L, Long.MaxValue) ++ octaves ++
      (1 to 2000).map(i => (i.toLong * 2654435761L) % 1000000007L)).filter(_ >= 0)
  }

  test("every value lies inside its bucket [lo, hi] at bits = 3, 5, 8") {
    val df = edgeValues.toDF("v")
    for (bits <- Seq(3, 5, 8)) {
      val bad = HdrSketch.bucketizeBits(df, col("v"), bits)
        .filter(!(col("c") >= col("lo") && col("c") <= col("hi")))
        .count()
      assert(bad == 0, s"bits=$bits: $bad values escaped their bucket")
    }
  }

  test("a negative value fails loudly instead of corrupting the sketch") {
    // a negative long has msb = 64 (bin() emits the two's complement) and
    // used to flow through silently with garbage lo/hi; the in-plan guard
    // must raise, and nulls must still pass through as nulls
    val ex = intercept[Exception] {
      HdrSketch.bucketize(Seq(5L, -3L).toDF("v"), col("v")).collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-negative")))
    val viaNull = HdrSketch.bucketize(
      Seq[java.lang.Long](5L, null).toDF("v"), col("v")).collect()
    assert(viaNull.length == 2 && viaNull.count(_.isNullAt(1)) == 1)
  }

  test("bucket id is monotone in the value (rank-respecting)") {
    val b = HdrSketch.bucketize(edgeValues.toDF("v"), col("v"))
      .select($"c", $"bucket", $"lo", $"hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    b.sliding(2).foreach {
      case Array((c1, bk1, _, h1), (c2, bk2, l2, _)) =>
        assert(bk1 <= bk2, s"bucket not monotone: $c1 -> $bk1 but $c2 -> $bk2")
        // distinct buckets must have disjoint, ordered ranges
        if (bk1 < bk2) assert(h1 < l2, s"overlapping ranges at $c1/$c2")
      case _ =>
    }
  }

  test("relative bucket width <= 2^-bits (exact below 2^(bits+1))") {
    val df = edgeValues.toDF("v")
    for (bits <- Seq(3, 5)) {
      val rows = HdrSketch.bucketizeBits(df, col("v"), bits)
        .select($"c", $"lo", (col("hi") - col("lo") + 1).as("w"))
        .collect()
      rows.foreach { r =>
        val (c, lo, w) = (r.getLong(0), r.getLong(1), r.getLong(2))
        if (c < (1L << (bits + 1))) assert(w == 1L, s"bits=$bits c=$c not exact")
        else assert(w <= math.max(lo >> bits, 1L), s"bits=$bits c=$c lo=$lo width $w too wide")
      }
    }
  }

  test("bucket count is bounded (~64 * 2^bits) even over the full long range") {
    val n = HdrSketch.bucketize(edgeValues.toDF("v"), col("v"))
      .select($"bucket").distinct().count()
    assert(n <= 64L * 32 + 32, s"bucket space blew up: $n")
  }

  test("sketch merges by adding counts: union-then-sketch == sketch-then-add") {
    val (a, b) = (edgeValues.take(1500), edgeValues.drop(1500))
    def sk(vs: Seq[Long]) =
      HdrSketch.counts(HdrSketch.bucketize(vs.toDF("v"), col("v")))
    val merged = sk(a).unionAll(sk(b))
      .groupBy($"bucket", $"lo", $"hi").agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val whole = sk(a ++ b)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(merged == whole)
  }

  test("weighted sketch: the exact weighted rank-q value falls inside the picked bucket") {
    val rows = (1 to 4000).map { i =>
      val g = s"g${i % 2}"
      val v = ((i.toLong * 48271) % 1000) * ((i.toLong * 69621) % 97 + 1)
      val w = (i.toLong * 16807) % 50 + 1 // weights in [1, 50]
      (g, v, w)
    }
    val df = rows.toDF("g", "v", "w")
    val est = HdrSketch.estimates(
      HdrSketch.weightedCounts(
        HdrSketch.bucketize(df, col("v"), col("g"), col("w")),
        col("w"), col("g")),
      col("g")).collect()
    assert(est.length == 6) // 2 groups x 3 quantiles
    val byGroup = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(t => (t._2, t._3)).sortBy(_._1)
    }
    est.foreach { r =>
      val (g, num, den) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (lo, hi, tw) = (r.getLong(4), r.getLong(5), r.getLong(6))
      val sorted = byGroup(g)
      assert(tw == sorted.map(_._2).sum)
      // x17 semantics: smallest value whose cumulative weight crosses q*tw
      var cum = 0L
      val exact = sorted.iterator.dropWhile { case (_, w) =>
        cum += w; cum * den < tw * num
      }.next()._1
      assert(exact >= lo && exact <= hi,
        s"group $g q=$num/$den: weighted-exact $exact outside [$lo, $hi]")
    }
  }

  test("rank-r order statistic falls inside the picked bucket for every group/quantile") {
    val rows = (1 to 5000).map { i =>
      val g = s"g${i % 3}"
      // heavy-tailed: exercises buckets across ~6 octaves
      val v = ((i.toLong * 48271) % 1000) * ((i.toLong * 69621) % 97 + 1)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val est = HdrSketch.estimates(
      HdrSketch.counts(HdrSketch.bucketize(df, col("v"), col("g")), col("g")),
      col("g")).collect()
    assert(est.length == 9) // 3 groups x 3 quantiles
    val byGroup = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    est.foreach { r =>
      val (g, num, den) = (r.getString(0), r.getLong(2), r.getLong(3))
      val (lo, hi, n) = (r.getLong(4), r.getLong(5), r.getLong(6))
      val sortedVs = byGroup(g)
      assert(n == sortedVs.length)
      val rank = ((n * num + den - 1) / den).toInt // ceil(q*n)
      val exact = sortedVs(rank - 1)
      assert(exact >= lo && exact <= hi,
        s"group $g q=$num/$den: exact $exact outside [$lo, $hi]")
    }
  }
}
