package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC MERGE: change-log compaction + full-outer upsert/delete apply.
  *
  * The distributed form of the reference pipeline's delete-then-insert
  * warehouse idempotency (gold materialization,
  * /root/reference/app/transform/gold.py — delete slice, insert slice):
  * instead of wiping a partition, a keyed change log is compacted to
  * its LATEST entry per key and applied to the base snapshot with one
  * co-partitioned full-outer join that classifies every key.
  *
  * Scale: compaction is one window per key — and because it is a
  * `row_number() = 1` filter, Spark plans a WindowGroupLimit BELOW the
  * exchange (map-side partial top-1), so the log never shuffles whole.
  * The apply is a single hash join on the key; both sides arrive
  * already partitioned by it, AQE covers skew. O(keys) state, no
  * broadcast requirement on either side.
  *
  * Determinism: callers pass an explicit total ordering (event time
  * THEN a log sequence number) so compaction is stable under duplicate
  * timestamps — the contract q118's oracle replays in DuckDB.
  */
object CdcMerge {

  /** Latest change per key: keeps exactly the first row of each key
    * under `ordering` (pass descending columns for "latest"). The
    * ordering must be total per key or compaction is nondeterministic —
    * include a sequence column as the final tiebreak.
    */
  def compact(changes: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Applies a COMPACTED change set to a base snapshot.
    *
    * `base`: (`keyCol`, `baseValueCol`); `changes`: (`keyCol`,
    * `chgValueCol`, `opCol`, extra passthrough columns). A change row
    * whose `opCol` equals "delete" removes the key (final value NULL);
    * anything else upserts `chgValueCol`.
    *
    * Output: `keyCol`, `action` ∈ {kept, updated, inserted, deleted,
    * noop_delete}, `final_value`, plus every extra change column.
    * Every change-side column resolves against the change frame's own
    * attributes (Dataset.col, not name lookup), so change columns may
    * share names with base columns — the only reserved names are the
    * outputs `action` and `final_value`.
    */
  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
      baseValueCol: String, chgValueCol: String, opCol: String): DataFrame = {
    val ck = "__chg_key"
    val chg = changes.withColumnRenamed(keyCol, ck)
    // bind every reference to its side's plan up front — an unqualified
    // col("x") after the join is ambiguous the moment both inputs carry
    // an "x" (op/value/passthrough name collisions with base columns)
    val bKey = base.col(keyCol)
    val cKey = chg.col(ck)
    val cOp = chg.col(opCol)
    val passthrough = chg.columns.filter(c => c != ck && c != chgValueCol && c != opCol)
    base.join(chg, bKey === cKey, "full_outer")
      .select(
        Seq(
          coalesce(bKey, cKey).as(keyCol),
          when(cKey.isNull, "kept")
            .when(cOp === "delete" && bKey.isNotNull, "deleted")
            .when(cOp === "delete", "noop_delete")
            .when(bKey.isNull, "inserted")
            .otherwise("updated").as("action"),
          when(cKey.isNull, base.col(baseValueCol))
            .when(cOp === "delete", lit(null).cast(base.schema(baseValueCol).dataType))
            .otherwise(chg.col(chgValueCol)).as("final_value")) ++
          passthrough.map(c => chg.col(c)): _*)
  }
}
