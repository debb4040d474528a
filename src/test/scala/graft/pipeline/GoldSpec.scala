package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Gold aggregation semantics (/root/reference/app/tasks/gold.py:74-170). */
class GoldSpec extends SparkSpec {

  private val silverLike = StructType(Seq(
    StructField("country", StringType, true),
    StructField("state", StringType, true),
    StructField("brewery_type", StringType, true)))

  private def silver(rows: (String, String, String)*) =
    spark.createDataFrame(
      rows.map(t => Row(t._1, t._2, t._3)).asJava, silverLike)

  test("G1: NULL dims normalize to '' before grouping") {
    val base = Gold.baseCounts(silver(
      ("US", "CA", "micro"), ("US", "CA", "micro"),
      ("US", "CA", null), (null, "CA", "micro")))
    val m = base.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(m(("US", "CA", "micro")) === 2)
    assert(m(("US", "CA", "")) === 1)
    assert(m(("", "CA", "micro")) === 1)
  }

  test("G2: rollup sums equal G1 totals at every grain") {
    val base = Gold.baseCounts(silver(
      ("US", "CA", "micro"), ("US", "CA", "nano"), ("US", "NY", "micro"),
      ("DE", "BY", "micro"), ("DE", "BY", "micro"))).cache()
    val total = base.collect().map(_.getLong(3)).sum
    assert(Gold.byCountryType(base).collect().map(_.getLong(2)).sum === total)
    assert(Gold.byStateType(base).collect().map(_.getLong(2)).sum === total)
    assert(Gold.byType(base).collect().map(_.getLong(1)).sum === total)
    // spot check one coarser cell
    val ct = Gold.byCountryType(base).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ct(("US", "micro")) === 2)
    base.unpersist()
  }
}
