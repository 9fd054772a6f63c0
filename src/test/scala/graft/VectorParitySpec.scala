package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VectorExpressions, VectorOps}

/** Bit-parity of the codegen'd vector kernels against the interpreted
  * higher-order-function formulations they replaced — any drift here would
  * silently break the DuckDB oracle hashes, so it gets its own gate
  * (mirrors the TextExpressions parity guarantee).
  */
class VectorParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (s, v) => s + v)

  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (s, v) => s + v))

  private def hofPlaneDot(emb: org.apache.spark.sql.Column, j: Int, shift: Double) =
    aggregate(
      transform(emb, (x, i) =>
        x.cast("double") *
          ((((lit(j * 64L) + i.cast("long")) * lit(2654435761L)) % lit(1000000007L))
            .cast("double") / lit(1e9) - lit(shift))),
      lit(0.0d), (s, v) => s + v)

  test("codegen'd dot/norm/planeDot are bit-identical to the HOF formulations") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(
        e.filter(col("vec_id") === 7).select(col("embedding").as("b")))
    val rows = pairs.select(
      VectorOps.dot(col("a"), col("b")).as("d1"),
      hofDot(col("a"), col("b")).as("d2"),
      VectorOps.norm(col("a")).as("n1"),
      hofNorm(col("a")).as("n2"),
      VectorOps.hashPlaneDot(col("a"), 2, 0.5).as("p1"),
      hofPlaneDot(col("a"), 2, 0.5).as("p2"),
      VectorOps.hashPlaneDot(col("a"), 3, 0.0).as("c1"),
      hofPlaneDot(col("a"), 3, 0.0).as("c2")
    ).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact double equality — bit parity, not epsilon closeness
      assert(r.getDouble(0) == r.getDouble(1), s"dot: ${r.getDouble(0)} != ${r.getDouble(1)}")
      assert(r.getDouble(2) == r.getDouble(3), s"norm: ${r.getDouble(2)} != ${r.getDouble(3)}")
      assert(r.getDouble(4) == r.getDouble(5), s"lsh plane: ${r.getDouble(4)} != ${r.getDouble(5)}")
      assert(r.getDouble(6) == r.getDouble(7), s"centroid plane: ${r.getDouble(6)} != ${r.getDouble(7)}")
    }
  }

  test("interpreted (non-codegen) eval path agrees too") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Any](1.5f, -2.25f, 3.0f))
    val b = new GenericArrayData(Array[Any](0.5f, 4.0f, -1.0f))
    assert(VectorExpressions.dotEval(a, b) == 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0)
    assert(VectorExpressions.normEval(a) ==
      Math.sqrt(1.5 * 1.5 + 2.25 * 2.25 + 3.0 * 3.0))
  }

  test("LshBucketDyn kernel == static lshBucketAt bits == nested-HOF spelling") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // static equivalence: dyn kernel at a literal k/offset must reproduce
    // the pinned-k bucket column exactly
    for ((k, off) <- Seq((4, 0), (12, 20), (16, 40))) {
      val bad = e.select(
        VectorExpressions.lshBucketDyn(col("embedding"), lit(k), off).as("dynb"),
        VectorOps.lshBucketAt(col("embedding"), k, off).as("statb"))
        .filter(col("dynb") =!= col("statb"))
      assert(bad.count() === 0, s"k=$k offset=$off")
    }
    // HOF equivalence at a RUNTIME k (the d29 oracle spelling)
    val hof = """aggregate(sequence(0, k - 1), CAST(0 AS BIGINT), (acc, b) ->
      acc + (CASE WHEN aggregate(transform(embedding, (x, i) ->
          CAST(x AS DOUBLE) * (((((20 + b) * 64 + i) * 2654435761) % 1000000007) / 1000000000.0 - 0.5)),
          CAST(0 AS DOUBLE), (a, v) -> a + v) > 0
        THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END))"""
    val bad2 = e.withColumn("k", (col("vec_id") % 13 + 4).cast("int"))
      .select(
        VectorExpressions.lshBucketDyn(col("embedding"), col("k"), 20).as("dynb"),
        expr(hof).as("hofb"))
      .filter(col("dynb") =!= col("hofb"))
    assert(bad2.count() === 0)
  }

  test("CentroidScoresDyn kernel == per-plane hashPlaneDot == HOF spelling at runtime c") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // static equivalence: element j of the dyn array must reproduce s5's
    // quantized hashPlaneDot(j, shift=0) column exactly
    val staticBad = e.select(
      (VectorExpressions.centroidScoresDyn(col("embedding"), lit(4)).as("sc") +:
        (0 until 4).map(j =>
          queries.quant(VectorOps.hashPlaneDot(col("embedding"), j, 0.0), 1e6).as(s"s$j"))): _*)
      .filter((0 until 4).map(j =>
        element_at(col("sc"), j + 1) =!= col(s"s$j")).reduce(_ || _))
    assert(staticBad.count() === 0)
    // HOF equivalence at a RUNTIME c (the s25 oracle spelling)
    val hof = """transform(sequence(0, c - 1), j ->
      FLOOR(aggregate(transform(embedding, (x, i) ->
        CAST(x AS DOUBLE) * ((((j*64 + i) * 2654435761) % 1000000007) / 1000000000.0)),
        CAST(0 AS DOUBLE), (a, v) -> a + v) * 1000000) / 1000000)"""
    val bad2 = e.withColumn("c", (col("vec_id") % 29 + 4).cast("int"))
      .select(
        VectorExpressions.centroidScoresDyn(col("embedding"), col("c")).as("dyn"),
        expr(hof).as("hofc"))
      .filter(col("dyn") =!= col("hofc"))
    assert(bad2.count() === 0)
  }

  test("dyn kernels reject out-of-range runtime sizes loudly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Any](1.5f, -2.25f, 3.0f))
    // a runtime width/count is a column value — a bad/unclamped input must
    // fail with the kernel's own message, not NegativeArraySizeException or
    // a giant per-row allocation
    for (c <- Seq(-1, 65537)) {
      val e = intercept[IllegalArgumentException](
        VectorExpressions.centroidScoresDynEval(a, c))
      assert(e.getMessage.contains("centroid_scores_dyn"))
    }
    assert(VectorExpressions.centroidScoresDynEval(a, 0).numElements() === 0)
    for (k <- Seq(-1, 64)) {
      val e = intercept[IllegalArgumentException](
        VectorExpressions.lshBucketDynEval(a, k, 0))
      assert(e.getMessage.contains("lsh_bucket_dyn"))
    }
    assert(VectorExpressions.lshBucketDynEval(a, 0, 0) === 0L)
  }

  test("PqDists kernel is bit-identical to the SQL HOF spelling") {
    // the SQL formulation is what the s7/s10 DuckDB oracles encode; the
    // kernel must reproduce it exactly (Math.pow, left-to-right sum,
    // floor-quantize) or the oracle hashes break
    def sqlDist(m: Int, j: Int): String = {
      val elem = s"CAST(element_at(embedding, ${m * 16} + i) AS DOUBLE)"
      val cval = s"(((${(m * 4 + j) * 16} + i - 1) * 2654435761) % 1000000007) / 1000000000.0 - 0.5"
      s"floor(aggregate(transform(sequence(1, 16), i -> power($elem - ($cval), 2)), " +
        s"CAST(0 AS DOUBLE), (acc, x) -> acc + x) * 1000000) / 1000000"
    }
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.pqDists(col("embedding")).as("ds"))
    val withRefs = (for { m <- 0 until 4; j <- 0 until 4 } yield (m, j))
      .foldLeft(e) { case (df, (m, j)) =>
        df.withColumn(s"ref_${m}_$j", expr(sqlDist(m, j)))
      }
    val mismatches = (for { m <- 0 until 4; j <- 0 until 4 } yield
      withRefs.filter(
        element_at(col("ds"), m * 4 + j + 1) =!= col(s"ref_${m}_$j")).count()).sum
    assert(mismatches == 0)
  }
}
