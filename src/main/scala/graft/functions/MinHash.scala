package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
// (Column↔Expression bridging lives in org.apache.spark.sql.classic)
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object MinHashKernel {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** MinHash signature of the 3-gram character shingles of `text`:
    * one md5 per shingle, digest split into `bands` 8-hex-char slices,
    * per-band lexicographic minimum. Equivalent to (but one-pass,
    * no intermediate arrays)
    *   list_min(list_transform(shingles, g -> substr(md5(g), 8*j+1, 8)))
    * for j in [0, bands). Returns null when length(text) < 3 (no
    * shingles), mirroring the SQL-side WHERE length(text) >= 3 guard.
    *
    * bands <= 4 (md5 = 32 hex chars / 8 per band).
    */
  def signature(text: UTF8String, bands: Int): ArrayData = {
    val s = text.toString
    if (s.length < 3) return null
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](bands)
    var i = 0
    while (i <= s.length - 3) {
      md.reset()
      val digest = md.digest(s.substring(i, i + 3).getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      var j = 0
      while (j < bands) {
        val slice = new String(hex, 8 * j, 8)
        if (mins(j) == null || slice.compareTo(mins(j)) < 0) mins(j) = slice
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }
}

/** Catalyst expression: `minhash_signature(text)` → array<string> of
  * `bands` per-band minima (null when no shingles exist). Codegen emits
  * a single call into MinHashKernel so the expression stays inside the
  * whole-stage-codegen pipeline with no per-row boxing beyond the
  * result array.
  */
case class MinHashSignature(child: Expression, bands: Int = 4)
    extends UnaryExpression {

  require(bands >= 1 && bands <= 4, "md5 yields at most 4 bands of 8 hex chars")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[UTF8String], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         ${ev.value} = graft.functions.MinHashKernel.signature($c, $bands);
         if (${ev.value} == null) { ${ev.isNull} = true; }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHash {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point (Spark 4: Column↔Expression bridging goes
    * through the package-private classic.ExpressionUtils — see Bridge). */
  def minhashSignature(c: Column, bands: Int = 4): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), bands))
}
