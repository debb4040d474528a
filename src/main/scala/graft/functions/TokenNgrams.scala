package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TokenNgramsKernel {

  /** Distinct space-joined token k-grams of `text`, split on single
    * spaces (empty tokens kept — the semantics of Spark `split(text,
    * ' ')` and DuckDB `string_split(text, ' ')` alike). First-occurrence
    * order, matching `array_distinct(transform(...))`.
    *
    * The HOF formulation re-evaluates its lambda per POSITION — and a
    * `split` written inside the lambda re-tokenizes the whole document
    * per position, O(tokens²) string work per row. This kernel
    * tokenizes once and assembles each gram from the token array —
    * one compiled pass, the q68 contamination screen's hot loop.
    */
  def ngrams(text: UTF8String, k: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }
}

/** `token_ngrams(text)` → array<string> of distinct space-joined token
  * k-grams. Codegen emits one kernel call inside whole-stage codegen. */
case class TokenNgrams(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "need k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenNgramsKernel.ngrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenNgramsKernel.ngrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "token_ngrams"
}

object Ngrams {
  import org.apache.spark.sql.graftbridge.Bridge

  def tokenNgrams(text: Column, k: Int): Column =
    Bridge.column(TokenNgrams(Bridge.expression(text), k))
}
