package graft.pipeline

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format matrix beyond the pipeline's JSON + Parquet
  * (SURVEY §2.1/§2.2): CSV, ORC, and line-text round-trips with the
  * schema-fidelity caveats each format carries. Parquet and JSON are
  * exercised end-to-end by the Bronze/Silver/Gold pipeline specs; this
  * suite pins the remaining formats Spark ships natively, so a user
  * switching a lake zone to any of them knows exactly what survives
  * the trip.
  */
class FormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("CSV round-trip preserves values under an explicit schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    // header + explicit quoting: c_name may contain the delimiter
    src.write.mode("overwrite").option("header", "true").csv(dir)
    // CSV is schemaless — reading back REQUIRES the declared schema
    // (inference would widen ints and re-type decimals)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(canon(back) === canon(src))
  }

  test("CSV inference diverges from the declared schema — the documented trap") {
    val dir = Files.createTempDirectory("graft-csv2").toString
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_acctbal")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    // values survive; EXACT dtypes are not guaranteed (that is the
    // reason the silver layer declares its schema instead of inferring)
    assert(inferred.count() === src.count())
    assert(inferred.schema("c_custkey").dataType !== null)
  }

  test("ORC round-trip is schema-exact like parquet") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = Tables.load(spark, sf, "nation")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(canon(back) === canon(src))
  }

  test("ORC honors partitioned layout + predicate pushdown like the silver zone") {
    val dir = Files.createTempDirectory("graft-orc2").toString
    val src = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
    src.write.mode("overwrite").partitionBy("c_mktsegment").orc(dir)
    val back = spark.read.orc(dir).filter(col("c_mktsegment") === "BUILDING")
    val expected = src.filter(col("c_mktsegment") === "BUILDING")
    assert(canon(back) === canon(expected))
    // partition pruning visible in the plan: only one partition dir read
    val scans = back.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.head.metadata("PartitionFilters")
      .contains("c_mktsegment"), "partition filter must reach the ORC scan")
  }

  test("line-text round-trip carries raw payloads byte-for-byte (bronze shape)") {
    val dir = Files.createTempDirectory("graft-text").toString
    val src = Tables.load(spark, sf, "documents")
      .filter(!col("text").contains("\n")).select("text").limit(200)
    src.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir).withColumnRenamed("value", "text")
    assert(canon(back) === canon(src))
    assert(back.schema === StructType(Seq(StructField("text", StringType, true))))
  }
}
