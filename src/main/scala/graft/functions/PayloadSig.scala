package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object PayloadSigKernel {

  /** Base-128-packed byte-class histogram of the 64-point nearest-
    * neighbor sample of `text` — q132's perceptual signature in ONE
    * O(len) pass. Sample position i (0..63) reads the code point at
    * character index (i·len) div 64 (identical to the SQL
    * `substr(text, 1 + (i·len) div 64, 1)` sampling), class =
    * min(codepoint div 32, 7) — the clamp folds every code point ≥ 224
    * into class 7, keeping the class index in 0..7 for ANY input (an
    * unclamped cls would wrap `1L << (7·cls)` mod 64 on non-Latin-1
    * text and carry across digits) — packed = Σ 128^class (counts
    * ≤ 64 < 128 — no digit carries; 128⁷ < 2⁶³). The q132 oracle
    * applies the identical least(…, 7).
    *
    * The column formulation pays 64 positional `substring` calls, each
    * an O(pos) UTF8String scan (O(64·len) per row — q132 benched ~2s
    * at sf0.1); this kernel walks the code-point index once and reads
    * the 64 samples from it. Code-point indexing matches DuckDB
    * substr/ascii semantics on non-BMP text (see graft.functions
    * .Shingles). Returns 0 for empty text (callers filter length ≥ 1).
    */
  def packedSig(text: UTF8String): Long = {
    val s = text.toString
    val cp = Shingles.starts(s)
    val n = cp.length - 1 // number of code points
    if (n <= 0) return 0L
    var pk = 0L
    var i = 0
    while (i < 64) {
      val pos = ((i.toLong * n) / 64).toInt
      val cls = math.min(s.codePointAt(cp(pos)) / 32, 7)
      pk += 1L << (7 * cls)
      i += 1
    }
    pk
  }
}

/** Catalyst expression: `payload_sig(text)` → bigint. */
case class PayloadSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    PayloadSigKernel.packedSig(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PayloadSigKernel.packedSig($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "payload_sig"
}

object PayloadSig {
  /** Column API: packed 64-sample byte-class signature of `text`. */
  def packedSig(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(PayloadSigExpr(
      org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}
