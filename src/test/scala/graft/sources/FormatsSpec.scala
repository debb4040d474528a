package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** Source/sink breadth: every columnar/text format the engine supports
  * round-trips the customer table losslessly (schema-declared reads —
  * no inference — mirroring the bronze contract). */
class FormatsSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private lazy val customer =
    Tables.load(spark, "/root/testdata/sf0.001", "customer")

  test("CSV round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft-csv").toString
    customer.write.mode("overwrite")
      .option("header", "true").csv(s"$dir/c")
    val back = spark.read.schema(customer.schema)
      .option("header", "true").csv(s"$dir/c")
    assert(canon(back) === canon(customer))
  }

  test("ORC round-trip") {
    val dir = Files.createTempDirectory("graft-orc").toString
    customer.write.mode("overwrite").orc(s"$dir/c")
    val back = spark.read.orc(s"$dir/c")
    assert(canon(back) === canon(customer))
  }

  test("JSON-lines round-trip with declared schema") {
    val dir = Files.createTempDirectory("graft-json").toString
    customer.write.mode("overwrite").json(s"$dir/c")
    val back = spark.read.schema(customer.schema).json(s"$dir/c")
    assert(canon(back) === canon(customer))
  }

  test("partitioned parquet round-trip preserves partition column values") {
    val dir = Files.createTempDirectory("graft-part").toString
    customer.write.mode("overwrite")
      .partitionBy("c_mktsegment").parquet(s"$dir/c")
    val back = spark.read.parquet(s"$dir/c")
      .select(customer.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    assert(canon(back) === canon(customer))
  }

  test("corrupt JSON routes to a dead-letter column; good rows survive intact") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // the bronze DLQ contract: a malformed page row must never kill the
    // read (PERMISSIVE) and must stay quarantinable (_corrupt_record),
    // while every well-formed row parses exactly
    val dir = Files.createTempDirectory("graft-dlq")
    val lines = Seq(
      """{"id": 1, "name": "alpha", "qty": 10}""",
      """{"id": 2, "name": "beta", "qty": "NOT_A_NUMBER"}""", // type violation
      """{"id": 3, "name": "gamma" """, // truncated json
      """not json at all""",
      """{"id": 5, "name": "epsilon", "qty": 50}""")
    Files.write(dir.resolve("page.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("qty", LongType),
      StructField("_corrupt_record", StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
      .cache() // corrupt-record access requires the full row to materialize
    val good = parsed.filter(col("_corrupt_record").isNull)
    val dlq = parsed.filter(col("_corrupt_record").isNotNull)
    assert(good.count() === 2L)
    assert(good.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      Set((1L, "alpha", 10L), (5L, "epsilon", 50L)))
    assert(dlq.count() === 3L, "all three malformed rows must quarantine")
    // the dead-letter column preserves the raw payload for replay
    assert(dlq.collect().forall(r => Option(r.getAs[String]("_corrupt_record"))
      .exists(_.nonEmpty)))
    parsed.unpersist()
  }
}
