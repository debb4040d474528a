package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-point range join — the scale path for joins whose
  * ONLY predicate is a range containment (no equi key), which Spark
  * otherwise plans as BroadcastNestedLoopJoin: O(n·m) comparisons and
  * a broadcast of one whole side.
  *
  * Standard bucketing decomposition: pick a granularity `bucketUs`,
  * explode each interval into every bucket it overlaps (for intervals
  * of bounded length L that is at most ceil(L/bucketUs)+1 rows — a
  * CONSTANT replication factor chosen by the caller, typically ~2),
  * tag each point with its single bucket, equi-join on the bucket and
  * re-check exact containment. Every (interval, point) match shares
  * exactly the point's one bucket, so each pair appears EXACTLY once —
  * no post-join dedup. The equi-join hash-partitions on the bucket
  * key, so the whole join is shuffle-bounded and AQE-skew-splittable
  * at any scale; no side is broadcast, nothing is quadratic.
  *
  * Times are integral microseconds (callers convert timestamps with
  * unix_micros); containment is start-inclusive, end-EXCLUSIVE.
  */
object RangeJoin {

  /** Joins `points` (time `tUs`) to `intervals` ([`sUs`, `eUs`)), both
    * BIGINT microseconds. Output: every interval column + every point
    * column of the matched pairs. Column names must be disjoint.
    * `bucketUs` must be >= the typical interval length to keep the
    * interval replication factor ~2 (correct for ANY length; longer
    * intervals just replicate into more buckets). */
  def pointInInterval(points: DataFrame, tUs: String,
      intervals: DataFrame, sUs: String, eUs: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket granularity must be positive")
    // end is exclusive: an interval touching a bucket boundary at its
    // end does not occupy the boundary bucket — (e-1) div keeps empty
    // and boundary-ending intervals from claiming an extra bucket
    // exact integer division (div) — a double-divide would lose
    // precision on large microsecond values
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$sUs div $bucketUs"),
        expr(s"($eUs - 1) div $bucketUs"))))
    val pb = points.withColumn("__bucket", expr(s"$tUs div $bucketUs"))
    ib.join(pb, Seq("__bucket"))
      .filter(col(tUs) >= col(sUs) && col(tUs) < col(eUs))
      .drop("__bucket")
  }
}
