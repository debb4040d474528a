package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object WinnowKernel {

  private val B = 257L
  private val M = 0xFFFFFFFFL // mod 2^32 via masking

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the value-set variant): polynomial ROLLING hash of
    * every k-gram (base 257, mod 2^32, over code points — see
    * [[Shingles]]), then the minimum hash of every sliding window of
    * `w` consecutive k-gram hashes; the distinct selected values,
    * sorted ascending, are the document's fingerprints.
    *
    * Guarantees: any match of length >= k + w - 1 between two
    * documents shares at least one fingerprint, and at most
    * ~2/(w+1) of all hashes are selected — a tunable sketch size. The
    * paper's tie rule (rightmost position) only matters when
    * fingerprints carry positions; a VALUE-set is unaffected by which
    * equal value a window selects, so per-window min value is
    * well-defined and engine-independent.
    *
    * O(n): the hash rolls (subtract the outgoing code point's
    * B^(k-1) term, multiply, add the incoming) and window minima come
    * from a monotonic deque — no per-window rescan. Equivalent to
    * (but one pass, no intermediate gram arrays) hashing each k-gram
    * independently and taking list_min per window, which is exactly
    * how the q61 oracle replays it in DuckDB.
    *
    * Returns null when the text has fewer than k code points (no
    * k-grams); texts with fewer than w hashes yield one window of all
    * hashes.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val cp = Shingles.starts(s)
    val n = cp.length - 1
    if (n < k) return null
    val nh = n - k + 1
    val hs = new Array[Long](nh)
    // B^(k-1) mod 2^32, and the first hash
    var pow = 1L
    var h = 0L
    var i = 0
    while (i < k) {
      h = (h * B + s.codePointAt(cp(i))) & M
      if (i < k - 1) pow = (pow * B) & M
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < nh) {
      val out = s.codePointAt(cp(i - 1)).toLong
      val in = s.codePointAt(cp(i + k - 1)).toLong
      h = (((h - ((out * pow) & M)) & M) * B + in) & M
      hs(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nh <= w) {
      var m = hs(0)
      var j = 1
      while (j < nh) { if (hs(j) < m) m = hs(j); j += 1 }
      selected.add(m)
    } else {
      val deque = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < nh) {
        while (!deque.isEmpty && hs(deque.peekLast()) >= hs(j)) deque.pollLast()
        deque.addLast(j)
        if (deque.peekFirst() <= j - w) deque.pollFirst()
        if (j >= w - 1) selected.add(hs(deque.peekFirst()))
        j += 1
      }
    }
    val out = new Array[Any](selected.size())
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: `winnow(text[, k, w])` → sorted distinct
  * array<bigint> of winnowing fingerprints (null when no k-gram
  * exists). Codegen emits one kernel call, keeping the expression
  * inside whole-stage codegen. */
case class Winnow(child: Expression, k: Int = 5, w: Int = 4)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow needs k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         ${ev.value} = graft.functions.WinnowKernel.winnow($c, $k, $w);
         if (${ev.value} == null) { ${ev.isNull} = true; }
       """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object Winnow {
  import org.apache.spark.sql.graftbridge.Bridge

  def winnow(c: Column, k: Int = 5, w: Int = 4): Column =
    Bridge.column(Winnow(Bridge.expression(c), k, w))
}
