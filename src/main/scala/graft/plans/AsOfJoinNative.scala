package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A native as-of join operator — the whole-operator Catalyst route
  * (LogicalPlan + Strategy + SparkPlan) for the semantics
  * graft.operators.AsOfJoin expresses by composition (union + window).
  *
  * Semantics: for every left row, the single right row with equal keys
  * (composite keys supported) and the greatest rightTime <= leftTime,
  * optionally within `tolerance` time units (LEFT OUTER: unmatched or
  * out-of-tolerance left rows carry nulls). The right side must be
  * unique per (keys, time) for deterministic results.
  *
  * Physical execution is a streaming merge: both children are
  * hash-partitioned on the full key list and sorted by (keys..., time)
  * — the same requirements a sort-merge join declares, so
  * EnsureRequirements inserts exactly one co-partitioning shuffle per
  * side and the merge itself is a single O(n+m) pass per partition
  * holding ONE buffered right row. Compared to the union+window
  * formulation this skips the union and the window's row_number
  * machinery entirely.
  *
  * Buffer safety: the sorter's output iterator reuses one UnsafeRow
  * whose backing pages are recycled as it advances, so the buffered
  * best-candidate row is copy()'d and its key/time values are
  * RE-EVALUATED from the copy — holding values eval'd from the live
  * iterator row (a UTF8String or Decimal pointing into sorter pages)
  * would silently corrupt comparisons for non-primitive key types.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long]) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lks, rks, lt, rt, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lks, rks, lt, rt, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // requireAllClusterKeys: both sides must hash on the FULL key list in
  // the same order — a child pre-partitioned on a key subset would
  // otherwise be accepted, breaking per-partition co-location.
  override def requiredChildDistribution: Seq[ClusteredDistribution] = Seq(
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true),
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  /** Time arithmetic for the tolerance gap — time columns are integral
    * under the hood (TimestampType = Long micros, DateType = Int days). */
  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short => s.longValue()
    case other => throw new IllegalArgumentException(
      s"as-of tolerance needs an integral-backed time type, got ${other.getClass}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lks = leftKeys.map(BindReferences.bindReference(_, left.output))
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rks = rightKeys.map(BindReferences.bindReference(_, right.output))
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyTypes = leftKeys.map(_.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.length
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Key extraction and comparison are CODEGEN'd, generated here on
      // the executor (only the bound expressions cross the closure):
      // one UnsafeProjection per key-row slot — each reuses its own
      // backing buffer, so the three slots never clobber one another —
      // and one generated lexicographic comparator over the key schema.
      // Replaces the round-2 interpreted path (per-row Array[Any] alloc
      // + per-field boxed eval + interpreted per-field Ordering).
      val lKeyProj = UnsafeProjection.create(lks)
      val nextKeyProj = UnsafeProjection.create(rks)
      val curKeyProj = UnsafeProjection.create(rks)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)

      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      // one buffered right row: the best (greatest-time) candidate seen.
      // curRow is a copy; curKey/curTime are re-projected FROM the copy
      // so they never reference recycled sorter memory.
      var curRow: InternalRow = null
      var curKey: UnsafeRow = null
      var curTime: Any = null
      // the not-yet-consumed head of the right iterator (values valid
      // only until the next rIter.next() — always consumed before then)
      var nextRow: InternalRow = null
      var nextKey: UnsafeRow = null
      var nextTime: Any = null

      def advanceRight(): Unit = {
        nextRow = null
        while (nextRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = nextKeyProj(r)
          val t = rt.eval(r)
          if (!k.anyNull && t != null) {
            nextRow = r; nextKey = k; nextTime = t
          } // rows with null key/time can never match — skip
        }
      }
      advanceRight()

      lIter.map { l =>
        val k = lKeyProj(l)
        val t = lt.eval(l)
        if (k.anyNull || t == null) {
          joined(l, nullRight)
        } else {
          // consume right rows that are still at-or-before (k, t)
          var cmp = if (nextRow == null) 1 else keyOrd.compare(nextKey, k)
          while (nextRow != null &&
            (cmp < 0 || (cmp == 0 && timeOrd.compare(nextTime, t) <= 0))) {
            curRow = nextRow.copy() // retained beyond the iterator step
            curKey = curKeyProj(curRow)
            curTime = rt.eval(curRow)
            advanceRight()
            cmp = if (nextRow == null) 1 else keyOrd.compare(nextKey, k)
          }
          val matched = curRow != null && keyOrd.compare(curKey, k) == 0 &&
            tol.forall(g => asLong(t) - asLong(curTime) <= g)
          if (matched) joined(l, curRow) else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
