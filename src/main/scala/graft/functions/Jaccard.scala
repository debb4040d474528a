package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Distinct word-5-gram shingle sets of both texts (tokens = split
    * on single space KEEPING empties — exactly Spark split(text,' ')
    * and DuckDB string_split), one pass: returns (|A ∩ B|, |A|, |B|,
    * |A∩B| / |A∪B|). Set cardinalities equal the md5-relabeled sets
    * q299/q302 intersect (md5 is injective on this corpus), so the
    * integer threshold 17c ≥ 7(|A|+|B|) replays their filter exactly.
    * Null when either side has fewer than 5 tokens — the engines'
    * shared "no windows" contract (q83's descending-sequence trap). */
  def jaccard5w(a: UTF8String, b: UTF8String): InternalRow = {
    val ta = a.toString.split(" ", -1)
    val tb = b.toString.split(" ", -1)
    if (ta.length < 5 || tb.length < 5) return null
    val setA = new java.util.HashSet[String]()
    var i = 0
    while (i <= ta.length - 5) {
      val sb5 = new java.lang.StringBuilder(ta(i))
      var j = 1
      while (j < 5) { sb5.append(' ').append(ta(i + j)); j += 1 }
      setA.add(sb5.toString)
      i += 1
    }
    val setB = new java.util.HashSet[String]()
    var inter = 0
    i = 0
    while (i <= tb.length - 5) {
      val sb5 = new java.lang.StringBuilder(tb(i))
      var j = 1
      while (j < 5) { sb5.append(' ').append(tb(i + j)); j += 1 }
      val g = sb5.toString
      if (setB.add(g) && setA.contains(g)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    new GenericInternalRow(Array[Any](
      inter.toLong, setA.size.toLong, setB.size.toLong,
      inter.toDouble / union.toDouble))
  }
}

/** Catalyst expression: `jaccard5w(a, b)` →
  * struct<n_common: bigint, sz_a: bigint, sz_b: bigint,
  * jaccard: double> over distinct word-5-gram sets. */
case class Jaccard5W(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_common", LongType, nullable = false),
    StructField("sz_a", LongType, nullable = false),
    StructField("sz_b", LongType, nullable = false),
    StructField("jaccard", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardKernel.jaccard5w(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         ${ev.value} = graft.functions.JaccardKernel.jaccard5w($a, $b);
         if (${ev.value} == null) { ${ev.isNull} = true; }
       """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard5w"
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

/** Kernels for PRECOMPUTED gram-set intersection: when one document's
  * gram set meets many counterparts (candidate-pair scoring), shingling
  * the text once per PAIR (jaccard3) or hashing a string array per pair
  * (array_intersect builds a hash set per call) is the hot cost.
  * Instead each doc computes ONE sorted array of injective int64 gram
  * codes — (c₀·1114112 + c₁)·1114112 + c₂ over code points, a bijection
  * from 3-grams (max code ≈ 1.38e18 < 2⁶³) so set cardinalities are
  * EXACTLY those of the string gram sets the oracle intersects — and
  * every pair is a branch-predictable sorted merge with zero
  * allocation. */
object GramCodeKernel {

  private final val Radix = 1114112L // Character.MAX_CODE_POINT + 1

  /** Sorted distinct injective codes of all 3-gram shingles; null when
    * the text has fewer than 3 code points. */
  def gramCodes3(t: UTF8String): ArrayData = {
    val s = t.toString
    val cp = Shingles.starts(s)
    val n = cp.length - 1
    if (n < 3) return null
    val codes = new Array[Long](n - 2)
    var i = 0
    while (i <= n - 3) {
      val c0 = s.codePointAt(cp(i))
      val c1 = s.codePointAt(cp(i + 1))
      val c2 = s.codePointAt(cp(i + 2))
      codes(i) = (c0.toLong * Radix + c1) * Radix + c2
      i += 1
    }
    java.util.Arrays.sort(codes)
    var m = 0
    i = 0
    while (i < codes.length) {
      if (m == 0 || codes(m - 1) != codes(i)) { codes(m) = codes(i); m += 1 }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = codes(i); i += 1 }
    new GenericArrayData(out)
  }

  /** |A ∩ B| of two ASCENDING string arrays by linear merge — the
    * string twin of [[sortedIntersect]], for gram sets whose codes
    * must stay md5 strings (oracle-shared key space; no 64-bit
    * re-hash collision class). UTF8String.compareTo is binary
    * (code-unit) order — exactly Spark sort_array's. */
  def sortedIntersectStr(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** |A ∩ B| of two ASCENDING long arrays by linear merge. */
  def sortedIntersect(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** `gram_codes3(text)` → sorted array<bigint> of distinct injective
  * 3-gram codes (null when length < 3 code points). */
case class GramCodes3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GramCodeKernel.gramCodes3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         ${ev.value} = graft.functions.GramCodeKernel.gramCodes3($c);
         if (${ev.value} == null) { ${ev.isNull} = true; }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gram_codes3"
}

/** `sorted_intersect_count(a, b)` → bigint: |A ∩ B| of two ascending
  * bigint arrays (one linear merge, no per-call hash set). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    GramCodeKernel.sortedIntersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GramCodeKernel.sortedIntersect($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** `sorted_intersect_count_str(a, b)` → bigint: |A ∩ B| of two
  * ascending string arrays (one linear merge, no per-call hash set). */
case class SortedIntersectCountStr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    GramCodeKernel.sortedIntersectStr(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GramCodeKernel.sortedIntersectStr($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count_str"
}

object Jaccard {
  import org.apache.spark.sql.graftbridge.Bridge

  def jaccard3(a: Column, b: Column): Column =
    Bridge.column(Jaccard3(Bridge.expression(a), Bridge.expression(b)))

  def jaccard5w(a: Column, b: Column): Column =
    Bridge.column(Jaccard5W(Bridge.expression(a), Bridge.expression(b)))

  def gramCodes3(text: Column): Column =
    Bridge.column(GramCodes3(Bridge.expression(text)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def sortedIntersectCountStr(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountStr(Bridge.expression(a), Bridge.expression(b)))
}
