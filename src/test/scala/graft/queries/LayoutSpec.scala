package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Z-order contract: the interleave is a bijection on the 8-bit × 8-bit
  * grid, and q80's blocks deliver the locality a writer relies on —
  * every block pins a narrow range of BOTH dimensions, which is what
  * makes one sorted layout prune scans filtered on either column.
  */
class LayoutSpec extends SparkSpec {

  test("interleave is a bijection on the full 8-bit grid") {
    val grid = spark.range(256 * 256)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
    val z = grid.select(Layout.interleaveCol(col("x"), col("y")).as("z"))
    assert(z.distinct().count() === 256L * 256L)
    assert(z.agg(min("z"), max("z")).head ===
      org.apache.spark.sql.Row(0L, 65535L))
  }

  test("z-interleave de-interleaves back to (x, y) across the grid") {
    val got = spark.range(256 * 256)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
      .withColumn("z", Layout.interleaveCol(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      def gather(start: Int) =
        (0 until 8).map(i => (((z >> (2 * i + start)) & 1L) << i)).sum
      assert(gather(0) === x && gather(1) === y,
        s"z=$z does not de-interleave to ($x, $y)")
    }
  }

  test("q80 blocks pin x div 8 and y div 8 — two-dimensional locality") {
    val df = SparkEntry.queries("q80_zorder")(spark, "/root/testdata/sf0.001")
    val perBlock = df.groupBy("block_id")
      .agg(countDistinct(expr("x div 8")).as("nx"),
        countDistinct(expr("y div 8")).as("ny"))
    val worst = perBlock.agg(max("nx"), max("ny")).head
    assert(worst.getLong(0) === 1L && worst.getLong(1) === 1L,
      s"a z-block must cover exactly one (x div 8, y div 8) cell: $worst")
  }

  test("sorting by zval co-sorts both dimensions at block granularity") {
    // after an order-by-z, consecutive rows' block ids are nondecreasing
    // and each block is a contiguous run — the property that makes
    // range-partition-by-z produce hyper-rectangular files
    val df = SparkEntry.queries("q80_zorder")(spark, "/root/testdata/sf0.001")
      .orderBy("zval").select("block_id").collect().map(_.getLong(0))
    val firstSeen = scala.collection.mutable.LinkedHashMap[Long, Int]()
    df.zipWithIndex.foreach { case (b, i) =>
      if (!firstSeen.contains(b)) firstSeen(b) = i
    }
    // contiguity: rows of each block form one run ⇔ block sequence never
    // returns to an earlier block
    val seq = df.foldLeft((Set.empty[Long], Option.empty[Long], true)) {
      case ((seen, prev, ok), b) =>
        if (prev.contains(b)) (seen, prev, ok)
        else (seen + b, Some(b), ok && !seen.contains(b))
    }
    assert(seq._3, "blocks must be contiguous runs in z order")
  }

  test("hilbert walk is a bijection on the full 8-bit grid") {
    val grid = spark.range(256 * 256)
      .select(lit(0L).as("p_partkey"),
        (col("id") % 256).as("x"), expr("id div 256").as("y"))
    val d = Layout.hilbertDf(grid).select(col("d"))
    assert(d.distinct().count() === 256L * 256L)
    assert(d.agg(min("d"), max("d")).head ===
      org.apache.spark.sql.Row(0L, 65535L))
  }

  test("hilbert consecutive d are grid neighbors — the unit-step property z lacks") {
    val cells = Layout.hilbertDf(
      spark.range(256 * 256).select(lit(0L).as("p_partkey"),
        (col("id") % 256).as("x"), expr("id div 256").as("y")))
      .select("d", "x0", "y0").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .sortBy(_._1).map(_._2)
    cells.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"step ($x1,$y1)→($x2,$y2) is not a unit move")
    }
  }
}
