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

  /** Dot product of two float-array columns in double precision.
    * Codegen'd kernel ([[VectorExpressions.DotProduct]]); bit-identical to
    * `dsumArr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))`.
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** L2 norm in double precision (codegen'd; bit-identical to
    * `sqrt(dsumArr(transform(a, x => x*x)))`).
    */
  def norm(a: Column): Column = VectorExpressions.norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot with deterministic hash plane `j`: element i is
    * `(((j*64 + i) * 2654435761) % 1000000007) / 1e9 - shift`.
    * shift=0.5 → LSH hyperplane family; shift=0 → IVF centroid family.
    */
  def hashPlaneDot(emb: Column, j: Int, shift: Double): Column =
    VectorExpressions.planeDot(emb, j, shift)

  /** Random-hyperplane LSH bucket id over `nPlanes` sign bits. */
  def lshBucket(emb: Column, nPlanes: Int): Column = lshBucketAt(emb, nPlanes, 0)

  /** LSH bucket over planes [offset, offset+nPlanes) — bit b of the bucket is
    * the sign of plane (offset+b). The multi-table OR-construction (E2LSH /
    * FAISS-style: L independent tables of k planes each) uses offset = t*k so
    * table t draws a disjoint plane set. Corpus-proof sizing rule: pick k ≈
    * log2(N / targetCellSize) so per-cell density — and with it the candidate
    * join's per-key fan-out — stays CONSTANT as the corpus grows; recall is
    * then bought back with tables (OR over L) and multi-probe (Hamming-ball
    * query-side fan-out), both of which cost query replication, never index
    * density. The 4-plane/16-cell config (s3/s4/s16/s17/s19) is the pinned
    * small-corpus baseline; s20/s21 run this parametric form at 4x12 planes.
    */
  def lshBucketAt(emb: Column, nPlanes: Int, offset: Int): Column =
    (0 until nPlanes).map { b =>
      when(hashPlaneDot(emb, offset + b, 0.5) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
}
