package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TextExpressions, TextOps}

/** The codegen'd text expressions must be bit-identical to the Column/HOF
  * formulations they replace (the DuckDB oracles encode the latter).
  */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)

  test("ShingleArray == array_distinct(transform(sequence...)) formulation") {
    val toks = TextOps.tokens(col("text"))
    val hof = array_distinct(
      transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
      )
    )
    val cmp = docs
      .filter(size(toks) >= 3)
      .select(
        col("doc_id"),
        hof.as("a"),
        TextExpressions.shingles(col("text"), 3).as("b")
      )
      .filter(col("a") =!= col("b"))
    assert(cmp.count() == 0)
  }

  test("MinHashSignature == per-seed TextOps.minhash") {
    val seeds = Seq((7L, 3L), (11L, 17L), (13L, 41L), (17L, 59L))
    val toks = TextOps.tokens(col("text"))
    val sig = TextExpressions.minhashSignature(col("text"), seeds)
    val cmp = seeds.zipWithIndex.foldLeft(
      docs.select(col("doc_id"), col("text"), sig.as("sig"))
    ) { case (df, ((a, b), i)) =>
      df.withColumn(s"ref$i", TextOps.minhash(TextOps.tokens(col("text")), a, b))
    }
    val bad = seeds.indices
      .map(i => cmp.filter(col("sig").getItem(i) =!= col(s"ref$i")).count())
    assert(bad.forall(_ == 0), bad)
  }

  test("edge cases: short and empty-ish texts") {
    import spark.implicits._
    val df = Seq("a", "a b", "a b c", "x x x x").toDF("text")
    val sh = df.select(TextExpressions.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0).isEmpty && sh(1).isEmpty)
    assert(sh(2) == Seq("a b c"))
    assert(sh(3) == Seq("x x x")) // duplicates collapse
  }

  test("SimHash60 == the per-bit HOF vote formulation") {
    // independent restatement of the same math with Spark built-ins: per
    // token v = mix((h·K) mod 2^60), bit b votes sign((v>>b)&1), majority
    val toks = TextOps.tokens(col("text"))
    def mixed(t: org.apache.spark.sql.Column) = {
      val m1 = (TextOps.tokenHash(t) * lit(2654435761L)) % lit(1L << 60)
      val v1 = m1.bitwiseXOR(shiftright(m1, 30))
      val lo = v1 % lit(1073741824L)
      val m2 = (lo * lit(2654435761L)) % lit(1L << 60)
      m2.bitwiseXOR(shiftright(m2, 30))
    }
    val hof = (0 until 60).map { b =>
      val vote = aggregate(
        toks,
        lit(0L),
        (s, t) => s + when(shiftright(mixed(t), b) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val cmp = docs
      .select(col("doc_id"), hof.as("a"), TextExpressions.simhash60(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(cmp.count() == 0)
  }

  test("SimHash8 kernel == TextOps.simhash8 HOF spelling (d6's oracle definition)") {
    val cmp = docs
      .select(col("doc_id"),
        TextOps.simhash8(TextOps.tokens(col("text"))).as("a"),
        TextExpressions.simhash8(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(cmp.count() == 0)
  }

  test("kernels == Column spellings on ASTRAL (non-BMP) tokens — codepoint semantics") {
    // Spark's ascii()/length() work in CODEPOINTS while Java's
    // charAt/length see UTF-16 units; on an emoji token the two disagree
    // (128512 vs surrogate 55357, and the lengths differ too). The kernel
    // tokenHash therefore uses codePointAt/codePointCount — this corpus
    // (astral-leading, astral-trailing, astral-only, mixed-BMP tokens)
    // pins the parity the fixture corpus' BMP-only text cannot reach.
    import spark.implicits._
    val astral = Seq(
      "😀abc x😀 a😀b", "𝔘nicode 😀 x", "日本 é😀é deadbeef",
      "😀 😀😀 😀😀😀", "mixed 𝒜𝒵 tail😀").toDF("text")
    val simCmp = astral
      .select(TextOps.simhash8(TextOps.tokens(col("text"))).as("a"),
        TextExpressions.simhash8(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(simCmp.count() == 0, "simhash8 kernel diverges on astral tokens")
    val seeds = Seq((7L, 3L), (11L, 17L))
    val mh = astral.select(col("text"),
      TextExpressions.minhashSignature(col("text"), seeds).as("sig"),
      TextOps.minhash(TextOps.tokens(col("text")), 7L, 3L).as("r0"),
      TextOps.minhash(TextOps.tokens(col("text")), 11L, 17L).as("r1"))
    assert(mh.filter(col("sig").getItem(0) =!= col("r0") ||
      col("sig").getItem(1) =!= col("r1")).count() == 0,
      "minhash kernel diverges on astral tokens")
  }

  test("GramFingerprints kernel == TextOps.gramFingerprints HOF spelling (d31's key)") {
    // includes the short-doc (< k tokens) empty-array branch and astral
    // tokens (codepoint semantics), plus the sf0.001 corpus
    import spark.implicits._
    val k = 10
    val corpus = docs.select(col("text"))
      .union(Seq(
        "😀abc x😀 a😀b", "one two three", "", " ",
        "a b c d e f g h i j k l 😀 日本 é").toDF("text"))
    val cmp = corpus
      .select(
        TextOps.gramFingerprints(TextOps.tokenHashes(TextOps.tokens(col("text"))), k).as("a"),
        TextExpressions.gramFingerprintsK(TextOps.tokens(col("text")), k).as("b"))
      .filter(col("a") =!= col("b"))
    assert(cmp.count() == 0, "gram-fingerprint kernel diverges from HOF spelling")
    val nonEmpty = corpus
      .select(TextExpressions.gramFingerprintsK(TextOps.tokens(col("text")), k).as("b"))
      .filter(size(col("b")) > 0)
    assert(nonEmpty.count() > 0, "degenerate test: no doc reached k tokens")
  }

  test("d20 band index finds exactly the brute-force Hamming<=3 pairs (recall 1)") {
    // pigeonhole exactness of the 4x15-bit multi-index: the banded candidate
    // join must recover every all-pairs hit — differential, not probabilistic
    val sims = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextExpressions.simhash60(col("text")).as("sim"))
    val a = sims.select(col("doc_id").as("a_id"), col("sim").as("sa"))
    val b = sims.select(col("doc_id").as("b_id"), col("sim").as("sb"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .filter(expr("bit_count(sa ^ sb)") <= 3)
      .select(col("a_id"), col("b_id"))
    val banded = SparkEntry.queries("d20_simhash_hamming")(spark, "/root/testdata/sf0.001")
      .select(col("doc_a").as("a_id"), col("doc_b").as("b_id"))
    assert(brute.exceptAll(banded).count() == 0, "banded index missed pairs")
    assert(banded.exceptAll(brute).count() == 0, "banded index invented pairs")
    assert(banded.count() > 0, "degenerate test: no near-dup pairs at sf0.001")
  }

  test("seeded simhash: seed 0 degenerates to simhash60, seeds decorrelate, bound enforced") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cmp = docs.select(
      TextExpressions.simhash60(col("text")).as("a"),
      TextExpressions.simhash60Seeded(col("text"), 0L).as("b"),
      TextExpressions.simhash60Seeded(col("text"), 777L).as("c"))
    assert(cmp.filter(col("a") =!= col("b")).count() == 0,
      "seed 0 must be exactly the unseeded fingerprint")
    // an independent half must actually be independent: identical on every
    // doc would make the wide index vacuous
    assert(cmp.filter(col("a") =!= col("c")).count() > 0,
      "seed 777 produced the same fingerprint as seed 0 on every doc")
    // overflow guard: a seed large enough to overflow the mix is rejected
    intercept[IllegalArgumentException] {
      graft.functions.SimHash60Seeded(
        org.apache.spark.sql.GraftShims.expression(col("text")), 3000000000L)
    }
  }

  test("d26 wide band index finds exactly the brute-force 120-bit Hamming<=3 pairs") {
    val sims = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        TextExpressions.simhash60(col("text")).as("s1"),
        TextExpressions.simhash60Seeded(col("text"), 777L).as("s2"))
    val a = sims.select(col("doc_id").as("a_id"), col("s1").as("s1a"), col("s2").as("s2a"))
    val b = sims.select(col("doc_id").as("b_id"), col("s1").as("s1b"), col("s2").as("s2b"))
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .filter(expr("bit_count(s1a ^ s1b) + bit_count(s2a ^ s2b)") <= 3)
      .select(col("a_id"), col("b_id"))
    val banded = SparkEntry.queries("d26_wide_simhash")(spark, "/root/testdata/sf0.001")
      .select(col("doc_a").as("a_id"), col("doc_b").as("b_id"))
    assert(brute.exceptAll(banded).count() == 0, "wide banded index missed pairs")
    assert(banded.exceptAll(brute).count() == 0, "wide banded index invented pairs")
  }
}
