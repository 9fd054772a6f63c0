package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernel for similarity search over embedding columns
  * (SURVEY.md §2.9). All math is Column expressions over `Array[Float]`
  * columns, cast element-wise to double with a fixed left-to-right
  * summation order so results are reproducible and oracle-comparable.
  *
  * Scale: brute-force top-k is one broadcast of the query vector + a single
  * pass (no shuffle until the final top-k); the LSH path buckets vectors by
  * random-hyperplane signs so candidate generation is an equi-join on the
  * bucket key — the 100 TB-safe plan.
  */
object VectorOps {
  /** Sequential left-to-right double sum of an array column. */
  def dsumArr(a: Column): Column = aggregate(a, lit(0.0d), (s, v) => s + v)

  /** Dot product of two float-array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    dsumArr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm in double precision. */
  def norm(a: Column): Column =
    sqrt(dsumArr(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for plane `j`,
    * element index `i` (0-based): uniform in [-0.5, 0.5).
    * SQL twin: ((((j*64 + i) * 2654435761) % 1000000007) / 1000000000.0 - 0.5)
    */
  private def planeVal(j: Int, i0: Column): Column =
    (((lit(j * 64L) + i0.cast("long")) * lit(2654435761L)) % lit(1000000007L))
      .cast("double") / lit(1e9) - lit(0.5)

  /** Random-hyperplane LSH bucket id over `nPlanes` sign bits. */
  def lshBucket(emb: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      val d = dsumArr(transform(emb, (x, i) => x.cast("double") * planeVal(j, i)))
      when(d > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
