package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering keys.
  *
  * Z-ordering (bit-interleaved space-filling curve) is the standard
  * lakehouse move for making ONE file sort order serve range predicates
  * on SEVERAL columns: rows close in z are close in every interleaved
  * dimension, so parquet min/max stats prune files for filters on x, on
  * y, or on both. The writer pattern at scale is
  * `df.repartitionByRange($"zval").sortWithinPartitions($"zval")
  * .write.parquet(...)` — one range exchange, then every output file
  * covers a small hyper-rectangle.
  *
  * The z computation itself is pure per-row bit arithmetic (zero
  * shuffles, whole-stage codegen); both engines evaluate the identical
  * shift/mask polynomial, so z-values are exact integers everywhere.
  */
object Layout {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Bits per interleaved dimension (16-bit z for 8-bit dims). */
  private val dimBits = 8

  /** q80's block granularity: z div 64 fixes the top 5 bits of each
    * dimension, so every block spans < 8 consecutive values of x div 8
    * and y div 8 — the locality contract `LayoutSpec` pins. */
  private val blockZ = 64

  /** The interleave polynomial Σ ((x>>i)&1)<<2i + Σ ((y>>i)&1)<<(2i+1),
    * generated once for both engines so they cannot drift. */
  private[queries] def interleaveSql(x: String, y: String): String = {
    val xs = (0 until dimBits).map(i => s"((($x >> $i) & 1) << ${2 * i})")
    val ys = (0 until dimBits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString(" + ")
  }

  private[queries] def interleaveCol(x: Column, y: Column): Column =
    ((0 until dimBits).map(i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)) ++
      (0 until dimBits).map(i =>
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)))
      .reduce(_ + _)

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q80
    // Z-order clustering key over part (p_size, quantized retail price):
    // 8 bits per dimension interleave into a 16-bit z-value; block_id =
    // zval div 64 is the unit a writer would range-partition and sort
    // by. Price quantizes through round() BEFORE the bigint cast —
    // DuckDB's double→int cast rounds half-even while Spark's
    // truncates, so the explicit round() is what keeps the engines
    // byte-identical.
    Q(
      "q80_zorder",
      Some(s"""
        WITH dims AS (
          SELECT p_partkey,
                 CAST(p_size AS BIGINT) & 255 AS x,
                 CAST(round(p_retailprice * 10) AS BIGINT) % 256 AS y
          FROM part)
        SELECT p_partkey, x, y,
               CAST(${interleaveSql("x", "y")} AS BIGINT) AS zval,
               CAST((${interleaveSql("x", "y")}) // $blockZ AS BIGINT) AS block_id
        FROM dims""")
    ) { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          col("p_size").cast("long").bitwiseAND(255L).as("x"),
          (round(col("p_retailprice") * 10).cast("long") % 256).as("y"))
        .withColumn("zval", interleaveCol(col("x"), col("y")).cast("long"))
        .withColumn("block_id", expr(s"zval div $blockZ"))
    },
  )
}
