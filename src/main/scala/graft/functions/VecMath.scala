package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Static kernels shared by interpreted eval and generated code.
  *
  * These are the hot inner loops of every vector query (q36/q37/q39/
  * q40/q54/q60/q65): quantization and the integer dot product. The HOF
  * formulations (`transform`, `aggregate(zip_with(...))`) evaluate an
  * interpreted lambda per ELEMENT — dim closure calls per row (and per
  * candidate PAIR in the verify joins); these kernels are one compiled
  * loop with zero allocation beyond quantize's result array. Array
  * elements must be non-null (embeddings and quantized vectors are).
  * The math is bit-for-bit the HOF/SQL formulation the DuckDB oracles
  * replay: floor(x·1000) per element; Σ aᵢ·bᵢ in Long.
  */
object VecKernel {

  /** floor(x * 1000) as BIGINT per element — `Vectors.qvExpr`'s math. */
  def quantize(v: ArrayData): ArrayData = quantize(v, 1000L)

  /** floor(x * scale) as BIGINT per element. scale=1000 is the exact
    * similarity grid; a small scale (q114 uses 16) is the coarse
    * scalar-quantization code an ANN candidate stage scans. */
  def quantize(v: ArrayData, scale: Long): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale.toDouble).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product of two equal-length quantized vectors —
    * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)`. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"qdot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Top-r spherical probe: the r centroid ids nearest `qv` by COSINE,
    * ascending by the exact (2 − dot/√cn, centroid_id) key — BIT-FOR-BIT
    * the `array_sort(transform(__cents, …))` + slice formulation
    * `operators/Ivf` evaluated interpreted (same IEEE divide/sqrt, same
    * 2.0− anchor, same 1e308 zero-mass sink, same id tiebreak; the
    * doubles can never be ±0.0 or NaN by the anchor/cn>0 construction).
    * `cents` is the broadcast array<struct<centroid_id, cv, cn>>. The
    * interpreted HOF ran the dim-64 dot as per-element closure calls —
    * k·dim interpreted ops per ROW, the ingest hot loop once nCentroids
    * rides the √n ladder; this is one compiled loop with a fixed
    * r-slot insertion buffer. Returns min(r, k) ids (slice semantics
    * when training dropped cells below r). */
  def cosProbe(qv: ArrayData, cents: ArrayData, r: Int): ArrayData = {
    val n = cents.numElements()
    val m = if (r < n) r else n
    val keys = new Array[Double](m)
    val ids = new Array[Int](m)
    var filled = 0
    var i = 0
    while (i < n) {
      val row = cents.getStruct(i, 3)
      val cid = row.getInt(0)
      val cn = row.getLong(2)
      val k =
        if (cn > 0) 2.0 - dot(qv, row.getArray(1)).toDouble /
          math.sqrt(cn.toDouble)
        else 1e308
      // insertion position by (k, cid) ascending
      var p = filled
      while (p > 0 && (k < keys(p - 1) ||
          (k == keys(p - 1) && cid < ids(p - 1)))) p -= 1
      if (p < m) {
        val last = if (filled < m) filled else m - 1
        var j = last
        while (j > p) { keys(j) = keys(j - 1); ids(j) = ids(j - 1); j -= 1 }
        keys(p) = k
        ids(p) = cid
        if (filled < m) filled += 1
      }
      i += 1
    }
    val out = new Array[Any](filled)
    var o = 0
    while (o < filled) { out(o) = ids(o); o += 1 }
    new GenericArrayData(out)
  }
}

/** `quantize_embedding(array<float>)` → array<bigint>: floor(x·scale),
  * default scale 1000 (the exact grid); small scales are coarse ANN codes. */
case class QuantizeEmbedding(child: Expression, scale: Long = 1000L)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    require(child.dataType == ArrayType(FloatType, containsNull = true) ||
      child.dataType == ArrayType(FloatType, containsNull = false),
      s"quantize_embedding needs array<float>, got ${child.dataType}")
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(input: Any): Any =
    VecKernel.quantize(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernel.quantize($c, ${scale}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_embedding"
}

/** `qdot(array<bigint>, array<bigint>)` → bigint: Σ aᵢ·bᵢ. */
case class QDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "qdot"
}

/** `cos_probe(array<bigint>, array<struct<centroid_id, cv, cn>>)` →
  * array<int>: the r nearest centroid ids by cosine (see
  * [[VecKernel.cosProbe]]). */
case class CosProbe(left: Expression, right: Expression, r: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.cosProbe(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernel.cosProbe($a, $b, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cos_probe"
}

object VecMath {
  import org.apache.spark.sql.graftbridge.Bridge

  def quantize(v: Column): Column =
    Bridge.column(QuantizeEmbedding(Bridge.expression(v)))

  def quantize(v: Column, scale: Long): Column =
    Bridge.column(QuantizeEmbedding(Bridge.expression(v), scale))

  def qdot(a: Column, b: Column): Column =
    Bridge.column(QDot(Bridge.expression(a), Bridge.expression(b)))

  def cosProbe(qv: Column, cents: Column, r: Int): Column =
    Bridge.column(CosProbe(Bridge.expression(qv), Bridge.expression(cents), r))
}
