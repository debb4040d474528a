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
  /** Loads one test table. `events.ts` has shipped in two fixture
    * generations: nanosecond-precision parquet (which Spark 4 refuses
    * to read as a timestamp — legacy nanosAsLong reads it as a long we
    * truncate to µs, exactly what DuckDB's reader does) and plain
    * µs-precision TIMESTAMP_NTZ. Handle both by inspecting the read
    * dtype; either way the result is a µs TimestampType in the UTC
    * session zone, identical to DuckDB's view (FIXTURES.md caveat).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Shuffle-partition count scaled to the INPUT, for linear passes
    * whose per-partition cost is super-linear (sort-merge joins,
    * sort-based aggregates): one partition per ~64 MB of input
    * parquet, floored at the session's shuffle-partition default.
    * At the test SFs this returns the default — plans there are
    * byte-identical to the fixed-conf ones — while at scale fixtures
    * (and on a real cluster) the count grows linearly with the data,
    * holding per-partition sort depth n·log(n/p) ≈ n·log(64 MB)
    * instead of n·log(n/32): the q192 α=0.85→0.80 fix at the 25×
    * rung. Static file-metadata arithmetic through the Hadoop
    * FileSystem API — no extra Spark job, and the sizing works on any
    * filesystem the cluster reads (HDFS/S3A/local), not just local
    * paths; an unreadable or absent table contributes zero bytes and
    * the floor default applies. */
  def scaledPartitions(spark: SparkSession, dir: String,
      tables: Seq[String]): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val bytes = tables.map { t =>
      try {
        val p = new org.apache.hadoop.fs.Path(dir, s"$t.parquet")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
        // NonFatal, not just IOException: Path construction throws
        // IllegalArgumentException on malformed dirs and some Hadoop
        // filesystems throw UnsupportedOperationException from
        // getContentSummary — any metadata failure must degrade to
        // "0 bytes, floor default", as documented above.
      } catch { case scala.util.control.NonFatal(_) => 0L }
    }.sum
    val default = spark.sessionState.conf.numShufflePartitions
    math.max(default, (bytes / (64L << 20)).toInt)
  }

  /** Spread a QUERY-PATH linear kernel's input across the executor
    * before the per-row map (q192's cliff fix, shared): a single-file
    * corpus scans as ONE task (parquet splits at row-group
    * granularity — a 15 MB file is one partition under the default
    * 128 MB split), stranding a CPU-heavy per-row kernel (simhash,
    * minhash shingling) on one core while the rest idle — 68 of
    * q192's 73 s at the 25× fixture. The repartition is
    * UNCONDITIONAL, exactly like q192's: the trigger is kernel cost
    * per row, not input bytes, so a byte-threshold would skip the
    * MB-sized fixtures where the stranding is worst; what scales with
    * the input is the WIDTH ([[scaledPartitions]]). The exchange
    * moves only the raw (key, text) bytes — sub-0.1 s at the test
    * SFs, and measured a net win at every scale rung where it
    * matters. */
  def spreadKernelInput(spark: SparkSession, dir: String,
      tables: Seq[String], df: DataFrame, key: Column): DataFrame =
    df.repartition(scaledPartitions(spark, dir, tables), key)
}

/** The engine's reproducible "random" stream: a salted Knuth
  * multiplicative hash in exact BIGINT arithmetic, identical in both
  * engines (salt adds BEFORE the multiply — see queries/Curation).
  * One definition, referenced by every consumer, so the Spark side
  * and the DuckDB oracles can never drift apart.
  *
  * The input is reduced mod 2³¹ BEFORE the multiply so the product
  * stays under 2⁶³ for ANY bigint input ((2³¹−1)·2654435761 ≈ 5.7e18):
  * Spark/Scala would wrap silently on overflow while DuckDB raises,
  * so without the reduction the cross-engine identity breaks for
  * ids ≳ 2^31.4. Inputs below 2³¹ (every shipped id domain) hash to
  * the same value as the unreduced form. */
object Knuth {
  def sql(column: String, salt: Long): String =
    s"((($column + $salt) % 2147483648) * 2654435761) % 4294967296"
  def col(c: Column, salt: Long): Column =
    (((c + lit(salt)) % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
}

object Det {
  /** Exact-decimal image of a double column (order-independent sums). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** SUM(double) with deterministic result: decimal-sum then one cast. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic AVG: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))
}

/** Logging hygiene for the headline mains (Verify / Bench / Diag). */
object Log {
  /** Silence WindowExecBase's per-execution "No Partition Defined for
    * Window operation!" line. Every unpartitioned window in the
    * registry is STRUCTURALLY audited by PlanSpec's global sweep — a
    * window with an empty partitionSpec must have a shrinking node
    * (aggregate/limit) beneath it on its streamed lineage, or sit on
    * the hand-audited whitelist (q121's survivor-only phase 2), and
    * the sweep FAILS the build otherwise. That sweep is the real
    * scale guard; the log line re-raises already-adjudicated sites
    * 500+ times per full Verify sweep, so the mains quiet the logger
    * (the structural check, unlike the log, cannot be ignored). */
  def quietAuditedWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
