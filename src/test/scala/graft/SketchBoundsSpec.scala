package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the approximate-sketch surface. x3 itself now runs
  * a deterministic KMV + grid-median pair (driver-oracled exactly), but the
  * engine still exposes Spark's HLL++/KLL sketches whose internals differ
  * across engines BY DESIGN — their bounds are enforced here, alongside the
  * KMV estimator's own relative-error bound against the exact distinct count.
  */
class SketchBoundsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("KMV k-minimum-values estimate is within the sketch's relative error") {
    import org.apache.spark.sql.Encoders
    val k = 64
    val P = 1000000007L
    val kmv = udaf(new graft.functions.Aggregates.KmvSketch(k), Encoders.scalaLong)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        ((lit(2654435761L) * col("l_partkey") + lit(12345L)) % P).as("h"),
        col("l_partkey"))
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"), kmv(col("h")).as("ret"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val ret = r.getSeq[Long](2)
      val est =
        if (ret.size < k) ret.size.toDouble
        else ((k - 1).toLong * P / ret.last).toDouble
      // KMV rsd ~ 1/sqrt(k-2) ≈ 0.127; allow 3 sigma
      assert(math.abs(est - exact) / exact <= 0.4,
        s"${r.getString(0)}: kmv=$est exact=$exact")
    }
  }

  test("KMV retained set is the k smallest distinct hashes regardless of partitioning") {
    import org.apache.spark.sql.Encoders
    val k = 8
    val kmv = udaf(new graft.functions.Aggregates.KmvSketch(k), Encoders.scalaLong)
    import spark.implicits._
    val data = Seq(5L, 3L, 9L, 3L, 1L, 7L, 5L, 2L, 8L, 6L, 4L, 10L, 1L)
    val expected = data.distinct.sorted.take(k)
    Seq(1, 3, 7).foreach { parts =>
      val got = data.toDF("h").repartition(parts)
        .agg(kmv(col("h")).as("ret")).head.getSeq[Long](0)
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("approx_count_distinct is within the default HLL++ relative error") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // default rsd = 0.05; allow 3 sigma
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("percentile_approx is within rank-error bounds of the exact percentile") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.05)").as("exact_p05"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p95")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, approx) = (r.getDouble(1), r.getDouble(2))
      val (p05, p95) = (r.getDouble(3), r.getDouble(4))
      // accuracy 10000 → rank error ~1/10000; being generous, the approx
      // median must at minimum stay far inside the p05..p95 band
      assert(approx >= p05 && approx <= p95, s"approx median $approx outside [$p05, $p95]")
      assert(math.abs(approx - exact) / math.max(exact, 1.0) <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("CMS estimate >= exact for EVERY key (one-sided guarantee) and the overestimate mass is eps-scale") {
    import graft.ops.CmsSketch
    import graft.functions.TextOps._
    val tok = Tables.documents(spark, sf)
      .select(explode(tokens(col("text"))).as("token"))
    val sketch = CmsSketch.counts(
      CmsSketch.bucketize(tok.select(tokenHash(col("token")).as("h")), col("h")))
    // ALL distinct tokens, not just t26's watchlist — the guarantee is
    // per-key universal. est is keyed on the HASH (collisions only ever
    // ADD mass), so est >= exact holds per token too.
    val allKeys = tok.distinct()
    val est = CmsSketch.probe(allKeys, sketch, tokenHash(col("token")), col("token"))
    val exact = tok.groupBy(col("token")).agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, Seq("token"))
      .select(col("token"), col("est"), col("exact")).collect()
    // the synthetic corpus has a tiny (~31-token) vocabulary — the real
    // collision stress lives in the synthetic section below
    assert(joined.length > 20)
    joined.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"${r.getString(0)}: est=${r.getLong(1)} < exact=${r.getLong(2)}")
    }

    // high-cardinality synthetic stress: ~45k singleton keys + 97 heavy
    // keys into 4x512 cells (~88 keys/bucket) — real collision mass, so
    // the min-over-rows and the one-sided bound are exercised for real
    val P = CmsSketch.P
    val keyed = spark.range(0, 50000).select(
      when(col("id") % 10 === 0, col("id") % 97).otherwise(col("id")).as("key"))
    val hashed = keyed.select(col("key"),
      ((lit(2654435761L) * col("key") + lit(987654321L)) % P).as("h"))
    val sk2 = CmsSketch.counts(CmsSketch.bucketize(hashed.select(col("h")), col("h")))
    val keys2 = hashed.select(col("key"), col("h")).distinct()
    val est2 = CmsSketch.probe(keys2, sk2, col("h"), col("key"))
    val exact2 = keyed.groupBy(col("key")).agg(count(lit(1)).as("exact"))
    val j2 = est2.join(exact2, Seq("key"))
      .select(col("key"), col("est"), col("exact")).collect()
    assert(j2.length > 40000)
    val n2 = j2.map(_.getLong(2)).sum
    j2.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"key ${r.getLong(0)}: est=${r.getLong(1)} < exact=${r.getLong(2)}")
    }
    // expected overestimate per row is ~N/width per collision term; the
    // median key must sit well inside a couple of eps*N (eps = e/512)
    val eps = math.E / CmsSketch.DefaultWidth
    val over = j2.map(r => r.getLong(1) - r.getLong(2)).sorted
    val medianOver = over(over.length / 2).toDouble
    assert(medianOver <= 2 * eps * n2,
      s"median overestimate $medianOver vs bound ${2 * eps * n2} (n=$n2)")
  }

  test("CMS merges by cell addition: sketch(A union B) == cellwise sum of the shard sketches") {
    import graft.ops.CmsSketch
    import graft.functions.TextOps._
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .select(col("doc_id"), tokenHash(col("token")).as("h"))
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      CmsSketch.counts(CmsSketch.bucketize(df, col("h"))).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cells(tok)
    val a = cells(tok.filter(col("doc_id") % 2 === 0))
    val b = cells(tok.filter(col("doc_id") % 2 === 1))
    val summed = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(whole == summed)
  }

  test("CMS join-size estimate: one-sided at ANY width, and adaptive width tames the collision mass") {
    import graft.ops.CmsSketch
    val P = CmsSketch.P
    // skewed key frame: ~45k singletons + 97 heavy keys (the SAME frame as
    // the point-estimate stress); join it with a filtered copy of itself
    val keyed = spark.range(0, 50000).select(
      when(col("id") % 10 === 0, col("id") % 97).otherwise(col("id")).as("key"))
    val aSide = keyed.filter(col("key") % 2 === 0)
    val bSide = keyed.filter(col("key") % 3 === 0)
    def h(f: org.apache.spark.sql.DataFrame) =
      f.select(((lit(2654435761L) * col("key") + lit(987654321L)) % P).as("h"))
    val exact = aSide.groupBy(col("key")).agg(count(lit(1)).as("fa"))
      .join(bSide.groupBy(col("key")).agg(count(lit(1)).as("fb")), Seq("key"))
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("x"))
      .collect()(0).getLong(0)
    def estAt(width: Int): Long = {
      def sk(f: org.apache.spark.sql.DataFrame) = CmsSketch.counts(
        CmsSketch.bucketizeDyn(h(f).withColumn("w", lit(width.toLong)), col("h"), col("w")))
      val prod = sk(aSide).withColumnRenamed("cnt", "ca")
        .join(sk(bSide).withColumnRenamed("cnt", "cb"), Seq("row_i", "bucket"))
        .groupBy(col("row_i")).agg(sum(col("ca") * col("cb")).as("e"))
        .agg(min(col("e")).as("est")).collect()
      prod(0).getLong(0)
    }
    val narrow = estAt(512)     // pinned narrow width: heavy collision mass
    val adaptive = estAt(1 << 18) // ~4x the ~46k distinct keys (the x35 rule)
    assert(narrow >= exact, s"narrow est $narrow < exact $exact")
    assert(adaptive >= exact, s"adaptive est $adaptive < exact $exact")
    // the adaptive width must cut the overestimate by well over an order
    // of magnitude relative to the pinned-narrow sketch
    val narrowOver = narrow - exact
    val adaptiveOver = adaptive - exact
    assert(narrowOver > 0, "narrow sketch should collide on a 46k-key domain")
    assert(adaptiveOver * 10 <= narrowOver,
      s"adaptive overest $adaptiveOver not << narrow overest $narrowOver (exact $exact)")
  }

  test("HDR splitSpec boundaries: monotone cuts and every rank-ceil(j*n/8) statistic inside its cut bucket") {
    import graft.ops.HdrSketch
    val cents = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
    val sk = HdrSketch.counts(
      HdrSketch.bucketize(cents, col("c"), col("l_returnflag")), col("l_returnflag"))
    // row: (group, q_label, num, den, est_lo, est_hi, n_group)
    val est = HdrSketch.estimatesWith(sk, HdrSketch.splitSpec(sk, 8), col("l_returnflag"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(est.length > 0)
    val exactRows = cents.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    est.groupBy(_._1).foreach { case (g, rows) =>
      val cuts = rows.sortBy(_._2).map(_._5) // est_hi ordered by num (q1..q7)
      assert(cuts.zip(cuts.tail).forall { case (a, b) => a <= b },
        s"$g: cuts not monotone: ${cuts.mkString(",")}")
      val vals = exactRows(g)
      rows.foreach { case (_, num, den, estLo, estHi, nGroup) =>
        assert(nGroup == vals.length)
        val r = (nGroup * num + den - 1) / den // ceil(j*n/8)
        val exact = vals(r.toInt - 1)
        assert(exact >= estLo && exact <= estHi,
          s"$g q$num/$den: exact rank-$r value $exact outside [$estLo, $estHi]")
      }
    }
  }

  test("d30 KMV Jaccard estimates track d22's exact per-pair Jaccard") {
    val est = SparkEntry.queries("d30_kmv_overlap")(spark, sf)
      .select(col("src_a"), col("src_b"), col("est_jaccard")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = SparkEntry.queries("d22_source_overlap")(spark, sf)
      .select(col("src_a"), col("src_b"), col("jaccard")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // d22 emits only pairs with >=1 shared shingle; d30 emits every pair
    // (est 0 allowed). Compare on d22's support, expect KMV rsd ~1/sqrt(k)
    assert(exact.nonEmpty)
    val errs = exact.map { case (pair, j) =>
      math.abs(est.getOrElse(pair, 0.0) - j)
    }.toSeq.sorted
    val mean = errs.sum / errs.size
    assert(mean <= 0.05, s"mean |est - exact| = $mean over ${errs.size} pairs")
    assert(errs.last <= 0.2, s"worst pair error ${errs.last}")
  }

  test("AMS F2 estimate tracks exact F2 across random frequency shapes (seeded)") {
    import graft.ops.AmsSketch
    import spark.implicits._
    // 12 random multisets sweeping the shapes that matter: uniform,
    // zipf-ish, single-hot-key-dominated, tiny. Seeded → deterministic.
    val rnd = new scala.util.Random(20260815L)
    val ratios = (1 to 12).map { i =>
      val nKeys = 1 + rnd.nextInt(3000)
      val shape = i % 3
      val keys: Seq[Long] = (1 to nKeys).flatMap { k =>
        val f = shape match {
          case 0 => 1 + rnd.nextInt(4)                       // near-uniform
          case 1 => math.max(1, (nKeys / k.toDouble).toInt)  // zipf-ish
          case 2 => if (k == 1) nKeys else 1                 // one hot key
        }
        Seq.fill(math.min(f, 5000))(k.toLong * 7919 + i)     // distinct key spaces per trial
      }
      val exact = keys.groupBy(identity).map { case (_, v) => v.size.toLong * v.size }.sum
      val hashed = keys.toDF("k")
        .select(((lit(2654435761L) * col("k") + lit(12345L)) % AmsSketch.P).as("h"))
      val est = AmsSketch.estimate(AmsSketch.sums(AmsSketch.bucketize(hashed, col("h"))))
        .collect().head.getAs[Double]("est_mom")
      est / exact
    }
    // every trial within 3x (hot-key F2 is huge, relative error small;
    // small uniform frames are the noisy end), and the ensemble centered:
    // the unbiasedness test a systematically-correlated sign family fails
    ratios.foreach(r => assert(r > 1.0 / 3 && r < 3.0, s"ratio $r out of envelope"))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.6 && mean < 1.5, s"ensemble mean $mean — estimator biased")
  }
}
