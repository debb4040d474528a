package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A native as-of join operator — the whole-operator Catalyst route
  * (LogicalPlan + Strategy + SparkPlan) for the semantics
  * graft.operators.AsOfJoin expresses by composition (union + window).
  *
  * Semantics: for every left row, the single right row with equal key
  * and the greatest rightTime <= leftTime (LEFT OUTER: unmatched left
  * rows carry nulls). The right side must be unique per (key, time) for
  * deterministic results.
  *
  * Physical execution is a streaming merge: both children are
  * hash-partitioned on the key and sorted by (key, time) — the same
  * requirements a sort-merge join declares, so EnsureRequirements
  * inserts exactly one co-partitioning shuffle per side and the merge
  * itself is a single O(n+m) pass per partition holding ONE buffered
  * right row. Compared to the union+window formulation this skips the
  * union and the window's row_number machinery entirely.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[ClusteredDistribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val nRight = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow

      // one buffered right row: the best (greatest-time) candidate seen
      var curRow: InternalRow = null
      var curKey: Any = null
      // the not-yet-consumed head of the right iterator
      var nextRow: InternalRow = null
      var nextKey: Any = null
      var nextTime: Any = null

      def advanceRight(): Unit = {
        nextRow = null
        while (nextRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rk.eval(r)
          val t = rt.eval(r)
          if (k != null && t != null) {
            nextRow = r; nextKey = k; nextTime = t
          } // rows with null key/time can never match — skip
        }
      }
      advanceRight()

      lIter.map { l =>
        val k = lk.eval(l)
        val t = lt.eval(l)
        if (k == null || t == null) {
          joined(l, nullRight)
        } else {
          // consume right rows that are still at-or-before (k, t)
          while (nextRow != null &&
            (keyOrd.compare(nextKey, k) < 0 ||
              (keyOrd.compare(nextKey, k) == 0 && timeOrd.compare(nextTime, t) <= 0))) {
            curRow = nextRow.copy() // retained beyond the iterator step
            curKey = nextKey
            advanceRight()
          }
          if (curRow != null && keyOrd.compare(curKey, k) == 0) joined(l, curRow)
          else joined(l, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
