package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Register-blocked bloom filter prefilter for semi joins — the
  * technique that keeps a 100 TB probe side from shuffling rows that
  * cannot possibly match (Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` plays the same trick
  * inside the optimizer; this is the explicit, plannable form with a
  * deterministic filter).
  *
  * Blocked layout (Putze et al., the parquet split-block shape): one
  * hash picks a single 64-bit word of the bitmap and the k probe bits
  * all land INSIDE that word. Build emits one (word, mask) row per
  * key; bitwise OR aggregation is commutative and idempotent, so the
  * bitmap is identical regardless of partitioning or merge order. The
  * sparse words then scatter into a DENSE `array<bigint>` via a
  * range left-join + sorted collect — O(words log words), and dense
  * matters: probing indexes the array O(1), and the array is a flat
  * few-KB literal once the scalar subquery evaluates.
  *
  * Probe: `(bloom[word] & mask) == mask` — ONE array lookup and one
  * compare per row, whole-stage codegen, no UDF. The bitmap attaches
  * as a SCALAR SUBQUERY inside a plain filter — the same shape Spark's
  * `InjectRuntimeFilter` produces — NOT as a cross join: a join-shaped
  * attach is something the optimizer may legally reorder
  * (`PushLeftSemiLeftAntiThroughJoin` pushes a following exact semi
  * join underneath it, leaving the bloom filtering already-joined
  * rows), while a filter predicate stays glued to the probe scan under
  * predicate pushdown. The single reference also matters: each
  * occurrence of a scalar subquery in a predicate becomes its own
  * analyzed subquery instance, multiplied again wherever constraint
  * propagation copies the predicate across a join.
  *
  * Rows that pass MAY be false positives — with n keys in m bits and k
  * bits per key the blocked-filter FP rate is ≈ (fill)^k where fill ≈
  * 1 - e^(-kn/m); the defaults (2^18 bits, 3 bits) hold a few percent
  * at n = 30k. Callers follow with the exact join, which only sees the
  * surviving fraction.
  */
object BloomPrefilter {

  /** numBits must be a multiple of 64 (whole bitmap words). */
  final case class Config(numBits: Int = 1 << 18, numHashes: Int = 3,
      seed: Long = 2027L) {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
    require(numHashes >= 1, "need at least one hash")
    def numWords: Int = numBits / 64
  }

  /** Word index of `key`'s block. */
  private def word(key: Column, cfg: Config): Column =
    pmod(xxhash64(lit(cfg.seed), key), lit(cfg.numWords.toLong))

  /** The k probe bits of `key`, OR-ed into one in-word mask. */
  private def mask(key: Column, cfg: Config): Column =
    (1 to cfg.numHashes).map { i =>
      call_function("shiftleft", lit(1L),
        pmod(xxhash64(lit(cfg.seed + i), key), lit(64L)).cast("int"))
    }.reduce(_ bitwiseOR _)

  /** Aggregates `keys(keyCol)` into a one-row dense bitmap
    * `__bloom: array<bigint>` of exactly numWords entries. */
  def build(keys: DataFrame, keyCol: String, cfg: Config = Config()): DataFrame =
    Dense.scatter(
      keys.select(word(col(keyCol), cfg).as("__w"), mask(col(keyCol), cfg).as("__m"))
        .groupBy("__w").agg(expr("bit_or(__m)").as("__bits")),
      "__w", "__bits", cfg.numWords, "__bloom")

  /** Membership test against a `__bloom` dense-array column. True ⇒
    * maybe present; false ⇒ definitely absent. `bloom` is referenced
    * exactly once (arrays are 1-indexed, hence the +1). */
  def mightContain(key: Column, bloom: Column, cfg: Config = Config()): Column = {
    val m = mask(key, cfg)
    element_at(bloom, (word(key, cfg) + 1).cast("int")).bitwiseAND(m) === m
  }

  /** The bitmap as a LITERAL column — the attach path for Structured
    * Streaming, where scalar subqueries cannot appear in the plan. The
    * one-row collect mirrors what Spark itself does to materialize a
    * runtime-filter subquery (driver evaluates, result ships to tasks
    * as a literal); the payload is numWords longs (32 KB at the
    * default), computed once per stream start, not per batch. */
  def bitmapLiteral(keys: DataFrame, keyCol: String,
      cfg: Config = Config()): Column =
    typedlit(build(keys, keyCol, cfg).head().getSeq[Long](0))

  private val viewId = new java.util.concurrent.atomic.AtomicInteger()

  /** Probe-side prefilter: keeps only rows whose `keyCol` might be in
    * `buildKeys(buildKeyCol)`. No false negatives; follow with the
    * exact join to kill false positives. The subquery executes once;
    * its one-row result reaches every task as a literal. */
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
