package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query differential invariants for the round-11 additions — each new
  * query is checked against an independent formulation or an already-oracled
  * sibling, not just its own DuckDB twin.
  */
class Round11QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("s20 wide-ANN results are true candidates: top-1 never beats brute force") {
    // the wide config retrieves a SUBSET of the db, so its per-query best
    // cosine is bounded by the exact best over all of db (s1-style brute
    // force recomputed here over the same %50 query/db split)
    import graft.functions.VectorOps._
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val qs = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val db = e.filter(col("vec_id") % 50 =!= 0)
    val exact = db.crossJoin(qs)
      .select(col("q_id"),
        queries.quant(dot(col("embedding"), col("q_emb")) /
          when(col("nrm") * col("q_nrm") > 0.0, col("nrm") * col("q_nrm")), 1e6).as("cs"))
      .filter(col("cs").isNotNull)
      .groupBy(col("q_id")).agg(max(col("cs")).as("best"))
    val s20 = q("s20_wide_ann").filter(col("rank") === 1)
      .select(col("q_id"), col("cos_sim"))
    val j = s20.join(exact, Seq("q_id"), "left")
    assert(j.filter(col("best").isNull || col("cos_sim") > col("best")).count() === 0)
  }

  test("s21 ladder agrees with s18 on the shared narrow configs") {
    // s21's lsh_16c_1p and lsh_16c_5p rows retrieve exactly what s18's
    // 1-probe and 5-probe rungs retrieve (same query sample, same probe
    // cells, same truth), so n_retrieved/n_hits/recall_ppm must match the
    // already-oracled s18 rows
    def l(r: org.apache.spark.sql.Row, i: Int): Long =
      r.get(i).asInstanceOf[Number].longValue
    val s18 = q("s18_recall_curve")
      .select(col("n_probes"), col("n_retrieved"), col("n_hits"), col("recall_ppm"))
      .collect().map(r => l(r, 0) -> ((l(r, 1), l(r, 2), l(r, 3)))).toMap
    val s21 = q("s21_wide_recall")
      .select(col("config"), col("n_retrieved"), col("n_hits"), col("recall_ppm"))
      .collect().map(r => r.getString(0) -> ((l(r, 1), l(r, 2), l(r, 3)))).toMap
    assert(s21("lsh_16c_1p") === s18(1L))
    assert(s21("lsh_16c_5p") === s18(5L))
  }

  test("s21 probe ladder is monotone and the wide config is the cheap one") {
    val rows = q("s21_wide_recall")
      .select(col("config"), col("n_cand"), col("n_hits"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (c1, h1) = rows("lsh_16c_1p")
    val (c5, h5) = rows("lsh_16c_5p")
    val (cw, _) = rows("lsh_4096c_x4_h1")
    // 5-probe candidates are a superset of 1-probe's (probe set contains the
    // own cell) -> more candidates, no fewer hits
    assert(c5 >= c1 && h5 >= h1)
    // the wide config's whole point: fewer candidates than the narrow
    // multi-probe ladder at the same corpus
    assert(cw < c5)
  }

  test("d28 candidates are sound: best prior sim never beats brute force, volume bounded") {
    import graft.functions.VectorOps._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val brute = a.crossJoin(b).filter(col("b_id") < col("a_id"))
      .select(col("a_id"),
        queries.quant(dot(col("a_emb"), col("b_emb")) /
          when(col("a_nrm") * col("b_nrm") > 0.0, col("a_nrm") * col("b_nrm")), 1e6).as("cs"))
      .filter(col("cs").isNotNull)
      .groupBy(col("a_id"))
      .agg(max(col("cs")).as("brute_best"), count(lit(1)).as("n_prior"))
    val d28 = q("d28_semdedup_wide")
    val j = d28.join(brute, d28("vec_id") === brute("a_id"), "left")
    // wide-cell candidates are a SUBSET of all prior pairs: the best
    // candidate sim can never exceed the true best, and the candidate count
    // can never exceed the prior count
    assert(j.filter(col("best_prior_sim").isNotNull &&
      (col("brute_best").isNull || col("best_prior_sim") > col("brute_best"))).count() === 0)
    assert(j.filter(col("n_cand_prior") > coalesce(col("n_prior"), lit(0L))).count() === 0)
    // non-vacuous: the wide cells do produce candidates on this corpus
    assert(d28.filter(col("n_cand_prior") > 0).count() > 0)
  }

  test("d29 adaptive code: k matches the integer formula, candidates sound vs brute") {
    val d29 = q("d29_semdedup_adaptive")
    // k = clamp(len(bin(ceil(n/8))), 4, 16) — n=500 at sf0.01 -> bin(63) -> 6
    val n = Tables.embeddings(spark, sf).count()
    val expK = math.max(4, math.min(16, java.lang.Long.toBinaryString((n + 7) / 8).length))
    assert(d29.select(col("k_planes")).distinct().collect().map(_.getLong(0)).toSeq === Seq(expK.toLong))
    // soundness: the adaptive candidate set is a subset of all prior pairs
    import graft.functions.VectorOps._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    val brute = a.crossJoin(b).filter(col("b_id") < col("a_id"))
      .select(col("a_id"),
        queries.quant(dot(col("a_emb"), col("b_emb")) /
          when(col("a_nrm") * col("b_nrm") > 0.0, col("a_nrm") * col("b_nrm")), 1e6).as("cs"))
      .filter(col("cs").isNotNull)
      .groupBy(col("a_id")).agg(max(col("cs")).as("brute_best"), count(lit(1)).as("n_prior"))
    val j = d29.join(brute, d29("vec_id") === brute("a_id"), "left")
    assert(j.filter(col("best_prior_sim").isNotNull &&
      (col("brute_best").isNull || col("best_prior_sim") > col("brute_best"))).count() === 0)
    assert(j.filter(col("n_cand_prior") > coalesce(col("n_prior"), lit(0L))).count() === 0)
    assert(d29.filter(col("n_cand_prior") > 0).count() > 0)
  }

  test("x31 discrete median/MAD agree with an in-driver exact recompute") {
    // independent of both engines: pull each group's values and compute the
    // lower median / MAD / outlier count directly (sf0.01 is 60k rows)
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("decimal(18,2)"))
      .collect().map(r => (r.getString(0), BigDecimal(r.getDecimal(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def lowerMedian(s: Seq[BigDecimal]): BigDecimal = {
      val n = s.size
      // smallest value at 1-based rank r with 2r >= n
      s((n + 1) / 2 - 1)
    }
    val expected = vals.map { case (g, s) =>
      // exact decimal arithmetic, like the query — a double recompute would
      // drift in the last ulp of the MAD
      val med = lowerMedian(s.toSeq)
      val ads = s.map(v => (v - med).abs).sorted
      val mad = lowerMedian(ads.toSeq)
      g -> ((s.size.toLong, med.toDouble, mad.toDouble, ads.count(_ > 3 * mad).toLong))
    }
    val got = q("x31_robust_zscore_dist").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    }.toMap
    assert(got === expected)
    // and the pinned interpolated baseline sees the same group sizes
    val x16n = q("x16_robust_zscore").select(col("l_returnflag"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._1).toMap === x16n)
  }

  test("s20 results invariant to the shuffle-partition count") {
    def rows() = q("s20_wide_ann").collect().map(_.toString).sorted.toSeq
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    val alt = (conf.toInt + 5).toString
    assert(alt !== conf)
    val a = rows()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", alt)
      assert(rows() === a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }
}
