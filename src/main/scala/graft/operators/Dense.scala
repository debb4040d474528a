package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scatter a sparse (index, value) frame into ONE row holding a dense
  * `array<bigint>` of length `n` (missing indexes → 0). Used by the
  * sketch operators (bloom bitmap, count-min counters): the dense
  * array is what probes index O(1) — `element_at` over a MAP scans
  * linearly — and at a few KB it broadcasts as a literal once a scalar
  * subquery evaluates it. Cost O(n log n) once, on one row.
  */
private[operators] object Dense {

  /** `sparse` must have BIGINT columns (`idxCol`, `valCol`) with
    * idxCol ∈ [0, n) and at most one row per index. Output column name:
    * `outCol`. */
  def scatter(sparse: DataFrame, idxCol: String, valCol: String,
      n: Int, outCol: String): DataFrame =
    sparse.sparkSession.range(n).select(col("id").as(idxCol))
      .join(sparse, Seq(idxCol), "left")
      .select(col(idxCol), coalesce(col(valCol), lit(0L)).as(valCol))
      .agg(sort_array(collect_list(struct(col(idxCol), col(valCol)))).as("__s"))
      .select(transform(col("__s"), s => s.getField(valCol)).as(outCol))
}
