package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * rightTime <= leftTime and equal keys. Spark has no native ASOF
  * operator; the scalable formulation is union + ordered window (one
  * shuffle on the key, no range-explosion, no cross product):
  *
  *   1. tag both sides, union by name (right payload nulled on left rows)
  *   2. window: last(payload, ignoreNulls) over
  *        partitionBy(keys).orderBy(time, side)  — side orders right rows
  *        before left rows at equal timestamps, so ties match (>= semantics)
  *   3. keep left rows; payload columns carry the as-of match
  *
  * The right side must be unique per (keys, time) — pre-aggregate it
  * (otherwise same-instant rows make any engine's ASOF nondeterministic).
  *
  * At 100 TB this is one hash-partition shuffle by key + a per-partition
  * sort — the same cost as any windowed analytic; a sort-merge ASOF
  * SparkPlan could drop the explicit union but not the shuffle.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows, unique per (keys, time)
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTime   left ordering column name
    * @param rightTime  right ordering column name
    * @param payload    right columns to carry onto matches (as-of values)
    */
  /** Native whole-operator route (graft.plans.AsOfJoinExec): a custom
    * LogicalPlan planned by a custom Strategy into a streaming-merge
    * SparkPlan — one co-partitioning shuffle per side, O(n+m) merge with
    * a single buffered right row, no union/window machinery. Output is
    * all left columns then all right columns (nulls when unmatched).
    *
    * @param keys       (leftCol, rightCol) equi-key pairs — composite
    *                   keys supported; any null key field never matches
    * @param tolerance  optional max gap leftTime - rightTime, in the
    *                   time column's native units (µs for TIMESTAMP,
    *                   days for DATE); a best match farther back than
    *                   this yields nulls like no match at all
    */
  def joinAsOfNative(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTime: String, rightTime: String,
      tolerance: Option[Long]): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    Bridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), tolerance))
  }

  /** Single-key, no-tolerance convenience overload. */
  def joinAsOfNative(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightKey: String,
      rightTime: String): DataFrame =
    joinAsOfNative(left, right, Seq(key -> rightKey), leftTime, rightTime, None)

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "__asof_side"
    val timeCol = "__asof_t"

    val l = left
      .withColumn(sideCol, lit(1))
      .withColumn(timeCol, col(leftTime))
    val r = right
      .withColumn(sideCol, lit(0))
      .withColumn(timeCol, col(rightTime))

    // align schemas: union by name with missing columns nulled
    val allCols: Seq[String] =
      (keys ++ Seq(sideCol, timeCol) ++ payload ++
        leftCols.filterNot(c => keys.contains(c))).distinct
    def aligned(df: DataFrame): DataFrame =
      df.select(allCols.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    val unioned = aligned(l).unionByName(aligned(r))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col(sideCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchCols: Seq[Column] =
      payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    unioned
      .select((allCols.filterNot(payload.contains).map(col) ++ matchCols): _*)
      .filter(col(sideCol) === 1)
      .drop(sideCol, timeCol)
  }
}
