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

object VecMath {
  import org.apache.spark.sql.graftbridge.Bridge

  def quantize(v: Column): Column =
    Bridge.column(QuantizeEmbedding(Bridge.expression(v)))

  def quantize(v: Column, scale: Long): Column =
    Bridge.column(QuantizeEmbedding(Bridge.expression(v), scale))

  def qdot(a: Column, b: Column): Column =
    Bridge.column(QDot(Bridge.expression(a), Bridge.expression(b)))
}
