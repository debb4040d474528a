package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode–Muthukrishnan) as pure declarative Spark:
  * frequency estimation over a key space too large to groupBy exactly
  * (URLs, n-gram ids, user ids at 100 TB — anything unbounded where a
  * full count table would itself be big data).
  *
  * Build: every item increments one counter per sketch row (cell =
  * row·width + hash_row(key) mod width). The increments are a keyed
  * groupBy-count over rows·width ≤ a few thousand cells — map-side
  * partial aggregation collapses the stream long before the shuffle —
  * and the cells scatter into one dense `array<bigint>` (`Dense`).
  * Counter addition is commutative/associative and exact, so the
  * sketch is deterministic under any partitioning.
  *
  * Estimate: est(key) = min over rows of the key's counter — an upper
  * bound on the true count (deterministic: underestimation is
  * impossible), with overestimate ≤ εN (ε ≈ e/width) only at
  * probability 1−δ (δ ≈ e^−rows) — a key colliding with a heavy key
  * in EVERY row blows any fixed bound, so width must sit well above
  * the heavy-key count (the default 1024 ≫ this corpus' 31-token
  * vocabulary; 256 put one token in a 3-row collision with hot keys).
  * q85's oracle pins `est ≥ exact` AND `est − exact ≤ N/width` per
  * key — on this corpus the sketch is collision-free in at least one
  * row for every key, so the flag is deterministic, verified at all
  * three SFs.
  *
  * The one-row sketch attaches to consumers via broadcast cross join
  * (the estimate references the array `rows` times — a scalar subquery
  * would analyze into one instance per reference, the q77 trap).
  */
object CountMin {

  final case class Config(rows: Int = 3, width: Int = 1024, seed: Long = 977L) {
    require(rows >= 1 && width >= 2, "need at least 1 row and 2 cells")
    def cells: Int = rows * width
  }

  /** Flat cell index of `key` in sketch row `r`. */
  private def cell(key: Column, r: Int, cfg: Config): Column =
    lit(r.toLong * cfg.width) +
      pmod(xxhash64(lit(cfg.seed + r), key), lit(cfg.width.toLong))

  /** Aggregates every item occurrence into the one-row dense sketch
    * `__cm: array<bigint>` of rows·width counters. */
  def build(items: DataFrame, keyCol: String, cfg: Config = Config()): DataFrame =
    Dense.scatter(
      items
        .select(explode(array((0 until cfg.rows)
          .map(r => cell(col(keyCol), r, cfg)): _*)).as("__c"))
        .groupBy("__c").agg(count(lit(1)).as("__n")),
      "__c", "__n", cfg.cells, "__cm")

  /** Point estimate of `key`'s frequency from a `__cm` column: the
    * minimum of its counters across rows (1-indexed arrays). */
  def estimate(key: Column, sketch: Column, cfg: Config = Config()): Column =
    least((0 until cfg.rows).map(r =>
      element_at(sketch, (cell(key, r, cfg) + 1).cast("int"))): _*)

  /** Cell-wise sum of two sketch columns — the mergeability that makes
    * the sketch distributed: per-partition (or per-day, per-shard)
    * sketches combine into the global one with no access to the raw
    * stream. merge(build(A), build(B)) == build(A ∪ B) exactly. */
  def merge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x + y)
}
