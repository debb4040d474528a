package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator-query: a Spark-side build plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Determinism rules shared by both sides (see SURVEY.md §7.5):
  *   - double aggregation goes through DECIMAL(18,4) (exact, order-free),
  *     final result cast back to DOUBLE;
  *   - vector math is quantized to BIGINT before any reduction;
  *   - every rank / top-k carries a total-order tiebreak.
  */
final case class Q(name: String, oracle: Option[String])(
    val build: (SparkSession, String) => DataFrame)

object Tables {
  /** Loads one test table. `events.ts` is nanosecond-precision parquet,
    * which Spark 4 refuses to read as a timestamp — read it as a long
    * (legacy nanosAsLong) and truncate to microseconds, which is exactly
    * what DuckDB's parquet reader does, so both engines see identical
    * µs timestamps (FIXTURES.md caveat).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}

/** The engine's reproducible "random" stream: a salted Knuth
  * multiplicative hash in exact BIGINT arithmetic, identical in both
  * engines (salt adds BEFORE the multiply — see queries/Curation).
  * One definition, referenced by every consumer, so the Spark side
  * and the DuckDB oracles can never drift apart. */
object Knuth {
  def sql(column: String, salt: Long): String =
    s"(($column + $salt) * 2654435761) % 4294967296"
  def col(c: Column, salt: Long): Column =
    ((c + lit(salt)) * lit(2654435761L)) % lit(4294967296L)
}

object Det {
  /** Exact-decimal image of a double column (order-independent sums). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** SUM(double) with deterministic result: decimal-sum then one cast. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic AVG: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}
