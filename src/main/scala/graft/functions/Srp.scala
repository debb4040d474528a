package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object SrpKernel {

  /** All `bands` sign-random-projection bucket values of a quantized
    * vector in ONE pass: band j's bucket is the integer of the
    * `rowsPerBand` sign bits of plane dots `firstPlane + j*r + t`,
    * with the deterministic plane weight
    *   w(p, i) = ((i*37 + 61p + 13) * (i + p + 1)) % 11 - 5   (i 1-based)
    * — bit-for-bit the math of `Lsh.planeDotExpr` / `planeDotSql`, so
    * oracles keep replaying the HOF formulation in DuckDB unchanged.
    *
    * The HOF formulation (`aggregate(zip_with(transform(sequence(...`)
    * evaluates interpreted lambdas per ELEMENT per PLANE — b×r×dim
    * closure calls per row; this kernel is a tight compiled loop with
    * zero allocation beyond the b-element result. Input array elements
    * must be non-null (quantized vectors are).
    */
  def buckets(qv: ArrayData, firstPlane: Int, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = qv.numElements()
    val out = new Array[Any](bands)
    var j = 0
    while (j < bands) {
      var bucket = 0L
      var t = 0
      while (t < rowsPerBand) {
        val p = firstPlane + j * rowsPerBand + t
        var dot = 0L
        var i = 0
        while (i < n) {
          val w = (((i + 1) * 37 + 61 * p + 13) * ((i + 1) + p + 1)) % 11 - 5
          dot += qv.getLong(i) * w
          i += 1
        }
        if (dot >= 0) bucket |= (1L << t)
        t += 1
      }
      out(j) = bucket
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: `srp_buckets(qv)` → array<bigint> of `bands`
  * bucket values (planes firstPlane .. firstPlane + bands*rowsPerBand).
  * Codegen emits one kernel call, keeping the whole banding inside
  * whole-stage codegen. */
case class SrpBuckets(child: Expression, firstPlane: Int, bands: Int,
    rowsPerBand: Int) extends UnaryExpression {

  require(firstPlane >= 0 && bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 62,
    "need firstPlane >= 0, bands >= 1, 1 <= rowsPerBand <= 62")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SrpKernel.buckets(input.asInstanceOf[ArrayData], firstPlane, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpKernel.buckets($c, $firstPlane, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "srp_buckets"
}

object Srp {
  import org.apache.spark.sql.graftbridge.Bridge

  def srpBuckets(qv: Column, firstPlane: Int, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(SrpBuckets(Bridge.expression(qv), firstPlane, bands, rowsPerBand))
}
