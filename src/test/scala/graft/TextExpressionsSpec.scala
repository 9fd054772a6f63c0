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
}
