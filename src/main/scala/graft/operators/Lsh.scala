package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized multi-band sign-random-projection LSH over quantized
  * embedding vectors (`array<bigint>`).
  *
  * Scale design: b bands × r planes per band. Each row is exploded into
  * b `(band, bucket)` keys; candidate pairs form ONLY within a
  * `(band, bucket)` group (hash-partitioned self-join on the band key —
  * never a cross join), and the per-band candidate sets are unioned
  * (dedup after verify). Growing `rowsPerBand` shrinks buckets
  * (precision: expected bucket count per band is 2^r); growing `bands`
  * recovers recall. This replaces the round-1 fixed 4-plane/16-bucket
  * blocking whose within-bucket pairing was O(n²/16) — here the
  * operator caller picks r ~ log2(n / targetBucketSize), so bucket size
  * (and therefore pair count per bucket) stays bounded as n grows.
  * For buckets that still overflow (skewed data), [[refineOversized]]
  * re-splits them with extra refinement planes.
  *
  * Determinism (cross-engine, see SURVEY.md §7.5): plane weights are
  * small integers from an explicit arithmetic formula, dots are exact
  * BIGINT sums over the pre-quantized vector, and a bucket is the
  * integer formed by the r sign bits — every step replays exactly in
  * DuckDB SQL (the oracle uses [[bandBucketSql]]).
  */
object Lsh {

  /** b bands × r planes per band; band j uses planes j*r .. j*r+r-1, so
    * band 0 of Config(1, r) and Config(b, r) are identical — adding
    * bands only ever ADDS candidates (monotone recall). */
  final case class Config(bands: Int, rowsPerBand: Int) {
    require(bands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 62,
      "need 1 <= bands, 1 <= rowsPerBand <= 62 (bucket is a signed long)")
    def planes: Int = bands * rowsPerBand
  }

  /** Deterministic SRP weight of plane `p` at 1-based dimension `i`:
    * w(p, i) = ((i*37 + 61p + 13) * (i + p + 1)) % 11 - 5 ∈ [-5, 5].
    * Nonlinear in i so no two planes are scalar multiples; plain
    * positive-int arithmetic so Spark and DuckDB agree bit-for-bit. */
  private def weightTerm(p: Int, i: String): String =
    s"(($i * 37 + ${61 * p + 13}) * ($i + ${p + 1})) % 11 - 5"

  /** Spark-side signed dot of quantized vector column `qvCol` with
    * plane `p` (exact BIGINT arithmetic). */
  def planeDotExpr(qvCol: String, p: Int): String =
    s"aggregate(zip_with($qvCol, transform(sequence(1, size($qvCol)), " +
      s"i -> cast(${weightTerm(p, "i")} as bigint)), (x, w) -> x * w), " +
      "0L, (acc, x) -> acc + x)"

  /** DuckDB-side replay of [[planeDotExpr]] (range upper bound is
    * exclusive; lists are 1-indexed). */
  def planeDotSql(qvCol: String, p: Int): String =
    s"CAST(list_aggregate(list_transform(range(1, len($qvCol) + 1), " +
      s"i -> $qvCol[CAST(i AS INT)] * (${weightTerm(p, "i")})), 'sum') AS BIGINT)"

  /** Bucket of band `j`: integer of the r sign bits of planes
    * j*r .. j*r+r-1. */
  def bandBucketCol(qvCol: String, band: Int, rowsPerBand: Int): Column =
    (0 until rowsPerBand).map { t =>
      when(expr(planeDotExpr(qvCol, band * rowsPerBand + t)) >= 0,
        lit(1L << t)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB-side replay of [[bandBucketCol]]. */
  def bandBucketSql(qvCol: String, band: Int, rowsPerBand: Int): String =
    (0 until rowsPerBand).map { t =>
      s"(CASE WHEN ${planeDotSql(qvCol, band * rowsPerBand + t)} >= 0 " +
        s"THEN ${1L << t} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Explodes each row into `cfg.bands` rows with integer columns
    * `band` (0-based) and `bucket`. `(band, bucket)` is the downstream
    * shuffle/join key. All b×r plane dots come from ONE codegen'd pass
    * over the vector (functions/SrpKernel — same math as
    * [[bandBucketCol]], which LshSpec pins as equal; the HOF
    * formulation evaluated interpreted lambdas per element per plane). */
  def explodeBands(df: DataFrame, qvCol: String, cfg: Config): DataFrame =
    df.select(
      col("*"),
      posexplode(graft.functions.Srp.srpBuckets(
        col(qvCol), 0, cfg.bands, cfg.rowsPerBand))
        .as(Seq("band", "bucket")))

  /** Within-bucket candidate self-join: pairs `(idCol_a, idCol_b)` with
    * `idCol_b > idCol_a` sharing one `(band, bucket)` key; every other
    * column is carried with `_a` / `_b` suffixes. A pair sharing
    * several bands appears once PER BAND — callers dedup after the
    * (deterministic) verify step, so the dedup shuffle carries verified
    * pairs only. */
  def selfJoinPairs(banded: DataFrame, idCol: String): DataFrame = {
    val carried = banded.columns.filterNot(Set(idCol, "band", "bucket"))
    def side(suffix: String) = banded.select(
      (col(idCol).as(s"${idCol}$suffix") +:
        col("band").as(s"band$suffix") +:
        col("bucket").as(s"bucket$suffix") +:
        carried.map(c => col(c).as(s"$c$suffix"))): _*)
    side("_a").join(side("_b"),
        col("band_a") === col("band_b") &&
          col("bucket_a") === col("bucket_b") &&
          col(s"${idCol}_b") > col(s"${idCol}_a"))
      .drop("band_a", "band_b", "bucket_a", "bucket_b")
  }

  /** Bucket-width (in key bits) after `round` refinement rounds: each
    * round appends `extra` sign bits plus one sentinel bit. */
  def widthAfter(cfg: Config, extra: Int, round: Int): Int =
    cfg.rowsPerBand + round * (extra + 1)

  /** Refinement sub-key of round `round`: integer of the `extra` sign
    * bits of planes cfg.planes + round*extra .. + extra-1 (indexed past
    * the banding planes, so independent of every band AND every earlier
    * round). */
  def refineSubCol(qvCol: String, cfg: Config, extra: Int, round: Int): Column =
    element_at(graft.functions.Srp.srpBuckets(
      col(qvCol), cfg.planes + round * extra, 1, extra), 1)

  /** DuckDB-side replay of [[refineSubCol]]. */
  def refineSubSql(qvCol: String, cfg: Config, extra: Int, round: Int): String =
    (0 until extra).map { u =>
      s"(CASE WHEN ${planeDotSql(qvCol, cfg.planes + round * extra + u)} >= 0 " +
        s"THEN ${1L << u} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Bucket-size bound with overflow re-split, iterated for `rounds`
    * rounds: each round counts rows per `(band, bucket)` key (a window
    * count — ONE hash shuffle per round) and, for groups exceeding
    * `maxBucket`, extends the key with `extra` fresh sign bits from
    * refinement planes plus a sentinel (so refined keys can never
    * collide with keys of any other round, and children of distinct
    * parents stay distinct). Pairs agreeing on the refinement planes
    * stay together — the standard bounded-recall trade on skewed data.
    *
    * The bound this actually gives (NOT a hard cap): after R rounds a
    * bucket exceeds `maxBucket` only if more than `maxBucket` rows agree
    * on all R*extra refinement planes — expected size shrinks by 2^extra
    * per round, and truly identical vectors can never be split (nor
    * should they be: their pairs are all true positives). Callers pick
    * `rounds` ≈ log_{2^extra}(worstBucket / maxBucket). Every step is
    * exact integer arithmetic replayable in DuckDB via [[refineSubSql]]
    * + a window COUNT (see the q54 oracle). */
  def refineOversized(banded: DataFrame, qvCol: String, cfg: Config,
      maxBucket: Int, extra: Int = 2, rounds: Int = 1): DataFrame = {
    require(extra >= 1 && rounds >= 1 &&
      widthAfter(cfg, extra, rounds) <= 62,
      "refined bucket must still fit a signed long")
    val byKey = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    (0 until rounds).foldLeft(banded) { (df, t) =>
      df.withColumn("__bucket_size", count(lit(1)).over(byKey))
        .withColumn("bucket",
          when(col("__bucket_size") <= maxBucket, col("bucket"))
            .otherwise(col("bucket") +
              (refineSubCol(qvCol, cfg, extra, t) + 1) *
                (1L << widthAfter(cfg, extra, t))))
        .drop("__bucket_size")
    }
  }
}
