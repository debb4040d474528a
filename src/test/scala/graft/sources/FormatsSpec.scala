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
}
