package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object JaccardKernel {

  /** Distinct 3-gram character shingle sets of both texts, one pass:
    * returns (|A ∩ B|, |A ∩ B| / |A ∪ B|) — exactly
    * size(array_intersect(...)) and the int/int division the SQL
    * formulation computes, so results are oracle-identical. Null when
    * either side has no shingles (length < 3).
    */
  def jaccard3(a: UTF8String, b: UTF8String): InternalRow = {
    val sa = a.toString
    val sb = b.toString
    // shingle by CODE POINT (see graft.functions.Shingles): matches
    // Spark substring() and DuckDB substr() on non-BMP text
    val cpa = Shingles.starts(sa)
    val cpb = Shingles.starts(sb)
    val na = cpa.length - 1
    val nb = cpb.length - 1
    if (na < 3 || nb < 3) return null
    val setA = new java.util.HashSet[String]()
    var i = 0
    while (i <= na - 3) { setA.add(sa.substring(cpa(i), cpa(i + 3))); i += 1 }
    val setB = new java.util.HashSet[String]()
    var inter = 0
    i = 0
    while (i <= nb - 3) {
      val g = sb.substring(cpb(i), cpb(i + 3))
      if (setB.add(g) && setA.contains(g)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    new GenericInternalRow(Array[Any](
      inter.toLong, inter.toDouble / union.toDouble))
  }
}

/** Catalyst expression: `jaccard3(a, b)` →
  * struct<n_common: bigint, jaccard: double>. */
case class Jaccard3(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_common", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccard3(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         ${ev.value} = graft.functions.JaccardKernel.jaccard3($a, $b);
         if (${ev.value} == null) { ${ev.isNull} = true; }
       """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard3"
}

object Jaccard {
  import org.apache.spark.sql.graftbridge.Bridge

  def jaccard3(a: Column, b: Column): Column =
    Bridge.column(Jaccard3(Bridge.expression(a), Bridge.expression(b)))
}
