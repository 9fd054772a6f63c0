package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hot vector kernels as native Catalyst expressions (SURVEY.md §7.3
  * promotion rule — same reasoning as [[TextExpressions]]): the
  * `aggregate(zip_with(...))` higher-order formulations in [[VectorOps]]
  * evaluate interpreted, dispatching a lambda per element per row; these run
  * the whole float-array loop in one compiled helper. The arithmetic is
  * bit-identical (element-wise float→double cast, left-to-right summation),
  * so every DuckDB oracle is unchanged.
  *
  * All kernels expect `ArrayType(FloatType)` embedding columns (the
  * `embeddings.embedding` schema); a dot over unequal lengths uses the
  * common prefix (matching `zip_with`'s non-null overlap).
  */
object VectorExpressions {

  def dotEval(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def normEval(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    Math.sqrt(s)
  }

  /** Dot with the deterministic hash plane `j` (element i value
    * `((j*64+i)*2654435761 mod 1e9+7)/1e9 - shift`): shift=0.5 gives the
    * LSH hyperplane family, shift=0 the IVF centroid family.
    */
  def planeDotEval(a: ArrayData, j: Int, shift: Double): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = (((j * 64L + i) * 2654435761L) % 1000000007L).toDouble / 1e9 - shift
      s += a.getFloat(i).toDouble * v
      i += 1
    }
    s
  }

  /** All 16 PQ subspace distances (4 subspaces × 4 grid centroids) of a
    * 64-dim embedding in ONE compiled loop — element (m*4+j) is the
    * floor-quantized squared L2 between subvector m (elements m*16+1..m*16+16,
    * 1-based) and deterministic centroid j (element i value
    * `(((m*4+j)*16 + i-1)*2654435761 mod 1e9+7)/1e9 - 0.5`).
    *
    * Bit-identical to the SQL spelling in
    * [[graft.queries.SimilarityPack.PqSql]] (`power(elem-cval, 2)` via
    * Math.pow, left-to-right accumulation, floor(x*1e6)/1e6), so the DuckDB
    * PQ oracles are unchanged; replaces 16 interpreted `aggregate(transform(
    * sequence(1,16), …))` lambda towers per row with one compiled pass.
    */
  def pqDistsEval(a: ArrayData): ArrayData = {
    val out = new Array[Any](16)
    var m = 0
    while (m < 4) {
      var j = 0
      while (j < 4) {
        var s = 0.0
        var i = 1
        while (i <= 16) {
          val elem = a.getFloat(m * 16 + i - 1).toDouble
          val cval = ((((m * 4 + j) * 16 + i - 1) * 2654435761L) % 1000000007L).toDouble / 1e9 - 0.5
          s += Math.pow(elem - cval, 2.0)
          i += 1
        }
        out(m * 4 + j) = Math.floor(s * 1000000.0) / 1000000.0
        j += 1
      }
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def dot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  def norm(a: Column): Column =
    GraftShims.column(L2Norm(GraftShims.expression(a)))

  def planeDot(a: Column, j: Int, shift: Double): Column =
    GraftShims.column(PlaneDot(GraftShims.expression(a), j, shift))

  /** LSH bucket over a RUNTIME plane count: bit b (b < k) is the sign of
    * hash plane (offset + b). One compiled pass — replaces the interpreted
    * `aggregate(sequence(0, k-1), …, transform(embedding, …))` lambda tower
    * (which materializes a 64-element array per plane per row) and is
    * bit-identical to it: each plane dot is the same left-to-right double
    * sum [[planeDotEval]] computes, so the DuckDB HOF oracles are
    * unchanged. Powers the corpus-adaptive code width in d29.
    */
  def lshBucketDynEval(a: ArrayData, k: Int, offset: Int): Long = {
    // k is a runtime column value (adaptive code width); > 63 would shift
    // past the Long and < 0 would silently yield bucket 0 — fail loudly.
    require(k >= 0 && k <= 63, s"lsh_bucket_dyn: code width $k outside [0, 63]")
    var bucket = 0L
    var b = 0
    while (b < k) {
      if (planeDotEval(a, offset + b, 0.5) > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  def lshBucketDyn(emb: Column, k: Column, offset: Int): Column =
    GraftShims.column(LshBucketDyn(GraftShims.expression(emb), GraftShims.expression(k), offset))

  /** All `c` centroid similarities of one embedding in ONE compiled pass:
    * element j is the floor-quantized (1e-6) dot with deterministic
    * centroid j (the shift=0 hash family, exactly s5's scores) — c is a
    * RUNTIME value, so the coarse quantizer's size can derive from a
    * broadcast corpus count (the adaptive-nlist IVF, s25). Bit-identical
    * to the interpreted `transform(sequence(0, c-1), …)` spelling and to
    * the DuckDB list_transform twin; replaces c interpreted lambda towers
    * (each materializing a 64-element array) with one tight loop.
    */
  def centroidScoresDynEval(a: ArrayData, c: Int): ArrayData = {
    // c is a runtime column value (adaptive nlist from a broadcast count);
    // guard it here so a bad/unclamped input fails loudly instead of
    // NegativeArraySizeException / an arbitrarily large per-row allocation.
    // 65536 is far above any sane coarse-quantizer size (s25 clamps to
    // [4, 256] in-plan; the cap only bounds the damage of a bug).
    require(c >= 0 && c <= 65536,
      s"centroid_scores_dyn: centroid count $c outside [0, 65536]")
    val out = new Array[Any](c)
    var j = 0
    while (j < c) {
      out(j) = Math.floor(planeDotEval(a, j, 0.0) * 1000000.0) / 1000000.0
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def centroidScoresDyn(emb: Column, c: Column): Column =
    GraftShims.column(CentroidScoresDyn(GraftShims.expression(emb), GraftShims.expression(c)))

  def pqDists(a: Column): Column =
    GraftShims.column(PqDists(GraftShims.expression(a)))
}

case class LshBucketDyn(emb: Expression, k: Expression, offset: Int)
    extends BinaryExpression {
  override def left: Expression = emb
  override def right: Expression = k
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, kv: Any): Any =
    VectorExpressions.lshBucketDynEval(
      a.asInstanceOf[ArrayData], kv.asInstanceOf[Number].intValue(), offset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, kv) =>
      s"graft.functions.VectorExpressions.lshBucketDynEval($a, (int)($kv), $offset)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LshBucketDyn =
    copy(emb = l, k = r)
  override def prettyName: String = "lsh_bucket_dyn"
}

case class CentroidScoresDyn(emb: Expression, c: Expression) extends BinaryExpression {
  override def left: Expression = emb
  override def right: Expression = c
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(a: Any, cv: Any): Any =
    VectorExpressions.centroidScoresDynEval(
      a.asInstanceOf[ArrayData], cv.asInstanceOf[Number].intValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, cv) =>
      s"graft.functions.VectorExpressions.centroidScoresDynEval($a, (int)($cv))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidScoresDyn =
    copy(emb = l, c = r)
  override def prettyName: String = "centroid_scores_dyn"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExpressions.dotEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorExpressions.dotEval($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class L2Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    VectorExpressions.normEval(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExpressions.normEval($c)")
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
  override def prettyName: String = "vec_norm"
}

case class PqDists(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VectorExpressions.pqDistsEval(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExpressions.pqDistsEval($c)")
  override protected def withNewChildInternal(c: Expression): PqDists = copy(child = c)
  override def prettyName: String = "pq_dists"
}

case class PlaneDot(child: Expression, j: Int, shift: Double) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    VectorExpressions.planeDotEval(v.asInstanceOf[ArrayData], j, shift)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExpressions.planeDotEval($c, $j, $shift)")
  override protected def withNewChildInternal(c: Expression): PlaneDot = copy(child = c)
  override def prettyName: String = "vec_plane_dot"
}
