package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime prefilter for semi joins — the technique that
  * keeps a 100 TB probe side from shuffling rows that cannot possibly
  * match (Spark's own `spark.sql.optimizer.runtime.bloomFilter` plays
  * the same trick inside the optimizer; this is the explicit,
  * plannable form with a deterministic filter).
  *
  * Build: the build side's join keys hash into `numHashes` bit
  * positions of a `numBits` bloom bitmap. The bitmap is aggregated as
  * (word → 64-bit OR) map entries — bitwise OR is commutative and
  * idempotent, so the result is identical regardless of partitioning
  * or merge order, and only words with at least one set bit are
  * materialized (the map is at most numBits/64 entries, a few KB).
  *
  * Probe: the one-row bitmap broadcasts onto the probe side and each
  * row tests all `numHashes` positions with pure builtin column
  * arithmetic (`element_at` + shift + mask — whole-stage codegen, no
  * UDF). A missing map entry means an all-zero word → definite
  * non-member, so `coalesce(_, 0)` keeps the no-false-negative
  * guarantee. Rows that pass MAY be false positives — callers follow
  * with the exact join, which now only sees the surviving fraction.
  *
  * Sizing: with n keys, m bits, k hashes the false-positive rate is
  * (1 - e^(-kn/m))^k — the defaults (2^18 bits, 3 hashes) hold ~2–3%
  * at n = 30k keys; at a real 100 TB build side you size m per
  * executor-memory budget the same way Spark's injected bloom does.
  */
object BloomPrefilter {

  /** numBits must be a multiple of 64 (whole bitmap words). */
  final case class Config(numBits: Int = 1 << 18, numHashes: Int = 3,
      seed: Long = 2027L) {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes >= 1, "need at least one hash")
  }

  /** i-th probe position of `key` — xxhash64 seeded by position index
    * (Kirsch–Mitzenmacher would also do; k independent hashes are just
    * as cheap here and simpler to reason about). */
  private def pos(key: Column, i: Int, cfg: Config): Column =
    pmod(xxhash64(lit(cfg.seed + i), key), lit(cfg.numBits.toLong))

  /** Aggregates `keys(keyCol)` into a one-row bitmap:
    * `bloom: map<bigint word_index, bigint word_bits>`. */
  def build(keys: DataFrame, keyCol: String, cfg: Config = Config()): DataFrame =
    keys
      .select(explode(array((0 until cfg.numHashes)
        .map(i => pos(col(keyCol), i, cfg)): _*)).as("__p"))
      .select(expr("__p div 64").as("__w"),
        expr("shiftleft(1L, int(__p % 64))").as("__m"))
      .groupBy("__w").agg(expr("bit_or(__m)").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__bloom"))

  /** Membership test against a `__bloom` map column. True ⇒ maybe
    * present; false ⇒ definitely absent. numBits is a multiple of 64,
    * so word index = p >> 6 and in-word bit = p mod 64. */
  def mightContain(key: Column, bloom: Column, cfg: Config = Config()): Column =
    (0 until cfg.numHashes).map { i =>
      val p = pos(key, i, cfg)
      val word = element_at(bloom, shiftright(p, 6))
      val mask = call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
      coalesce(word, lit(0L)).bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)

  private val viewId = new java.util.concurrent.atomic.AtomicInteger()

  /** Probe-side prefilter: keeps only rows whose `keyCol` might be in
    * `buildKeys(buildKeyCol)`. No false negatives; follow with the
    * exact join to kill false positives.
    *
    * The bitmap attaches as a SCALAR SUBQUERY inside a plain filter —
    * the same shape Spark's own `InjectRuntimeFilter` produces — NOT as
    * a cross join: a join-shaped attach is something the optimizer may
    * legally reorder (`PushLeftSemiLeftAntiThroughJoin` pushes a
    * following exact semi join underneath it, leaving the bloom
    * filtering already-joined rows), while a filter predicate stays
    * glued to the probe scan under predicate pushdown. The subquery
    * executes once; its one-row result reaches every task as a literal. */
  def prefilter(probe: DataFrame, keyCol: String,
      buildKeys: DataFrame, buildKeyCol: String,
      cfg: Config = Config()): DataFrame = {
    val view = s"graft_bloom_bits_${viewId.incrementAndGet()}"
    build(buildKeys, buildKeyCol, cfg).createOrReplaceTempView(view)
    probe.filter(mightContain(col(keyCol),
      expr(s"(SELECT __bloom FROM $view)"), cfg))
  }

  /** Bloom-accelerated left-semi join: prefilter, then the exact semi
    * join (which removes the bloom's false positives). Semantically
    * identical to `probe.join(build, keys, "left_semi")`; physically
    * the probe side is cut down before any join exchange. */
  def semiJoin(probe: DataFrame, keyCol: String,
      build: DataFrame, buildKeyCol: String,
      cfg: Config = Config()): DataFrame = {
    val keys = build.select(col(buildKeyCol)).distinct()
    prefilter(probe, keyCol, keys, buildKeyCol, cfg)
      .join(keys, col(keyCol) === col(buildKeyCol), "left_semi")
  }
}
