package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checked bucket-entropy invariant for EVERY banded index in the
  * suite (VERDICT r17 item 1, made structural).
  *
  * Why this exists: the r17 band-degeneracy bug — one simhash band of
  * d20/d26 collapsing to a token-length profile because the one-round
  * multiplicative mix left bits 45-59 ≈ raw tokenHash high bits — survived
  * 16 rounds of DuckDB oracles (hash compares are mix-agnostic: the oracle
  * recomputes the same degenerate key) and three bench decades, and only
  * surfaced when the 50× ladder produced a 46k-doc bucket and 3.3B
  * candidate pairs for ~8k true hits. Correctness gates CANNOT catch this
  * failure class; only a direct occupancy check on the banded key can.
  *
  * The invariant, per banded index, at sf0.1 (the largest committed-oracle
  * corpus shape). Measured values on the current kernels (this spec's
  * `info` lines reproduce them every run):
  *
  *   - `maxBucketFrac`  = (largest bucket) / n_items ≤ 10% — no band may
  *     concentrate a corpus-fraction of items into one bucket. Healthy
  *     worst case measured: d20 3.9% (a genuine 194-doc template family at
  *     n=5000); the r17 one-round mix measures 23% here and 18% at sf5
  *     (46,202 of ~250k docs in ONE band-3 bucket). The margin widens with
  *     scale: a healthy max bucket is a fixed-size near-dup cluster so its
  *     FRACTION falls as the corpus grows, while a profile-degenerate
  *     bucket tracks the corpus.
  *   - `pairsPerItem`   = Σ_buckets c·(c−1)/2 / n_items ≤ 128 — the
  *     candidate join's per-item fan-out must stay O(1)-ish in the corpus.
  *     Healthy worst case measured: d29 adaptive cells 47 (density-8 cells
  *     by design → ≲ 4 tables × density² /2 /density ≈ 32, plus cluster
  *     mass); the degenerate mix measures 495 here and ~13k/doc at sf5
  *     (3.3B candidates / 250k docs).
  *
  * Each bound sits ≥2.5× above the healthiest-worst measurement and ≥2×
  * below the degenerate one — and sf0.1 is the WORST case for separation
  * (see above), so neither noise nor corpus growth flips the verdict. A
  * REGRESSION case runs the exact r17 one-round mix through the same check
  * and asserts it violates BOTH bounds — proving the spec detects the bug
  * class it was built for.
  *
  * The same metrics ship as a first-class, oracle-checked query —
  * `d33_band_entropy_probe` (DedupPack) — so a deployment runs the probe
  * in-pipeline; this spec additionally pins the BOUNDS and the
  * degenerate-mix regression proof.
  *
  * Covered banded indexes (band-key spellings pinned to the pack code):
  *   - d20: simhash60, 4×15-bit bands          (DedupPack "d20_simhash_hamming")
  *   - d26: two seeded halves, 4×30-bit bands  (DedupPack "d26_wide_simhash")
  *   - d25/d27: trigram-shingle MinHash band buckets (DedupPack.lshVerifiedEdges)
  *   - s20/d28: multi-table hyperplane LSH, 4 tables × 12 planes
  *     (SimilarityPack s20 / DedupPack d28, VectorOps.lshBucketAt)
  *   - d29/s22/s25: adaptive-k cells, k = len(bin(ceil(n/8))) in [4,16],
  *     offsets t·20 (DedupPack "d29_semdedup_adaptive", lshBucketDyn)
  */
class BandEntropySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.1"
  private lazy val spark = SparkTestSession.spark

  /** Occupancy stats of one banded index: `df` must have one row per
    * (item, band) with the bucket key in `keyCols` (band id included in the
    * key where the index is banded — buckets never merge across bands).
    */
  private case class BandStats(
      nItems: Long, nBuckets: Long, maxBucket: Long, pairs: Double) {
    def maxBucketFrac: Double = maxBucket.toDouble / nItems
    def pairsPerItem: Double = pairs / nItems
  }

  private def stats(df: DataFrame, nItems: Long, keyCols: Seq[Column]): BandStats = {
    val occ = df.groupBy(keyCols: _*).agg(count(lit(1)).as("c"))
    val r = occ.agg(
      count(lit(1)).as("buckets"),
      max(col("c")).as("mx"),
      sum(col("c").cast("double") * (col("c") - 1) / 2).as("pairs")
    ).head()
    BandStats(nItems, r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  private val MaxBucketFrac = 0.10
  private val MaxPairsPerItem = 128.0

  private def assertHealthy(name: String, s: BandStats): Unit = {
    info(f"$name: n=${s.nItems} buckets=${s.nBuckets} maxBucket=${s.maxBucket} " +
      f"maxFrac=${s.maxBucketFrac}%.5f pairs/item=${s.pairsPerItem}%.2f")
    assert(s.maxBucketFrac <= MaxBucketFrac,
      s"$name: one bucket holds ${s.maxBucket}/${s.nItems} items " +
        s"(${s.maxBucketFrac}) — banded key is degenerate (r17 bug class)")
    assert(s.pairsPerItem <= MaxPairsPerItem,
      s"$name: candidate fan-out ${s.pairsPerItem}/item — banded key is " +
        "degenerate (r17 bug class)")
  }

  private lazy val docs = Tables.documents(spark, sf).localCheckpoint()
  private lazy val nDocs = docs.count()

  // ---------------------------------------------------------------- d20
  test("d20 simhash 4x15-bit bands keep healthy bucket entropy") {
    import graft.functions.TextExpressions
    val sims = docs.select(col("doc_id"),
      TextExpressions.simhash60(col("text")).as("sim"))
    val bands = sims.select(col("doc_id"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sim"), 15 * k) % 32768): _*)))
      .select(col("pos").as("band"), col("col").as("bv"))
    assertHealthy("d20", stats(bands, nDocs, Seq(col("band"), col("bv"))))
  }

  // ---------------------------------------------------------------- d26
  test("d26 wide simhash 4x30-bit bands keep healthy bucket entropy") {
    import graft.functions.TextExpressions
    val sims = docs.select(col("doc_id"),
      TextExpressions.simhash60(col("text")).as("s1"),
      TextExpressions.simhash60Seeded(col("text"), 777L).as("s2"))
    val bands = sims.select(col("doc_id"),
      posexplode(array((0 until 4).map(k =>
        (shiftright(col("s1"), 15 * k) % 32768) * 32768 +
          shiftright(col("s2"), 15 * k) % 32768): _*)))
      .select(col("pos").as("band"), col("col").as("bv"))
    assertHealthy("d26", stats(bands, nDocs, Seq(col("band"), col("bv"))))
  }

  // ---------------------------------------------------------------- d25/d27
  test("d25/d27 shingle-MinHash band buckets keep healthy bucket entropy") {
    import graft.functions.{TextExpressions, TextOps}
    // same signature construction as DedupPack.lshVerifiedEdges (trigram
    // shingles, 4 permutations, bands = (mh0,mh1) and (mh2,mh3))
    val seeds = Seq((7L, 3L), (11L, 17L), (13L, 41L), (17L, 59L))
    val sigs = docs
      .select(col("doc_id"), TextExpressions.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: seeds.zipWithIndex.map { case ((a, b), i) =>
        array_min(transform(col("sh"),
          t => (lit(a) * TextOps.tokenHash(t) + lit(b)) % lit(1000000007L)))
          .as(s"mh$i")
      }: _*)
      .localCheckpoint()
    val n = sigs.count()
    val b0 = sigs.select(lit(0).as("band"),
      concat_ws(":", col("mh0"), col("mh1")).as("bv"))
    val b1 = sigs.select(lit(1).as("band"),
      concat_ws(":", col("mh2"), col("mh3")).as("bv"))
    assertHealthy("d25-minhash-bands",
      stats(b0.unionByName(b1), n, Seq(col("band"), col("bv"))))
  }

  // ---------------------------------------------------------------- s20/d28
  test("s20/d28 multi-table LSH cells (4x12 planes) keep healthy bucket entropy") {
    import graft.functions.VectorOps.lshBucketAt
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    val cells = e.select(col("vec_id"),
      posexplode(array((0 until 4).map(t =>
        lshBucketAt(col("embedding"), 12, t * 12)): _*)))
      .select(col("pos").as("tbl"), col("col").as("bucket"))
    assertHealthy("s20-lsh-cells", stats(cells, n, Seq(col("tbl"), col("bucket"))))
  }

  // ---------------------------------------------------------------- d29
  test("d29/s22 adaptive-k LSH cells keep healthy bucket entropy") {
    import graft.functions.VectorExpressions.lshBucketDyn
    val e = Tables.embeddings(spark, sf)
    val n = e.count()
    // integer-exact adaptive width, exactly d29's in-plan formula
    val k = math.max(4, math.min(16, java.lang.Long.toBinaryString((n + 7) / 8).length))
    val cells = e.select(col("vec_id"),
      posexplode(array((0 until 4).map(t =>
        lshBucketDyn(col("embedding"), lit(k), t * 20)): _*)))
      .select(col("pos").as("tbl"), col("col").as("bucket"))
    assertHealthy(s"d29-adaptive-cells(k=$k)",
      stats(cells, n, Seq(col("tbl"), col("bucket"))))
  }

  // ---------------------------------------------------------------- regression
  test("REGRESSION: the r17 one-round mix FAILS the entropy bound") {
    // Exact replica of the pre-fix kernel: tokenHash (codepoint semantics,
    // TextExpressions.tokenHash) + ONE multiplicative mix round — bits
    // 45-59 of the result are ≈ (h >> 14), and tokenHash's high bits carry
    // only the token-length term, so band 3 collapses to a token-length
    // profile of the document. The healthy kernel differs ONLY in mix60's
    // second round.
    def tokenHashJvm(t: String): Long = {
      val first = if (t.isEmpty) 0 else t.codePointAt(0)
      val last = if (t.isEmpty) 0 else t.codePointBefore(t.length)
      val cpLen = t.codePointCount(0, t.length).toLong
      (cpLen * 2654435761L + first * 131L + last) % 1000000007L
    }
    def mixOneRound(h: Long): Long = {
      val m1 = (h * 2654435761L) & ((1L << 60) - 1)
      m1 ^ (m1 >>> 30)
    }
    val degenerateSim = udf { text: String =>
      val toks = text.split(" ", -1)
      val votes = new Array[Int](60)
      toks.foreach { t =>
        val v = mixOneRound(tokenHashJvm(t))
        var b = 0
        while (b < 60) {
          if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      (0 until 60).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val sims = docs.select(col("doc_id"), degenerateSim(col("text")).as("sim"))
    val bands = sims.select(col("doc_id"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("sim"), 15 * k) % 32768): _*)))
      .select(col("pos").as("band"), col("col").as("bv"))
    val s = stats(bands, nDocs, Seq(col("band"), col("bv")))
    info(f"degenerate one-round mix: maxFrac=${s.maxBucketFrac}%.4f " +
      f"pairs/item=${s.pairsPerItem}%.1f")
    assert(s.maxBucketFrac > MaxBucketFrac && s.pairsPerItem > MaxPairsPerItem,
      "the degenerate one-round mix PASSED an entropy bound — the bound " +
        "is too loose to catch the r17 bug class; tighten it " +
        f"(maxFrac=${s.maxBucketFrac}%.4f vs $MaxBucketFrac, " +
        f"pairs/item=${s.pairsPerItem}%.1f vs $MaxPairsPerItem)")
  }
}
