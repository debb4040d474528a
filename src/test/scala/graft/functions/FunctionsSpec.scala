package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class FunctionsSpec extends SparkSpec {

  test("MinHashSignature matches the HOF formulation") {
    import spark.implicits._
    val docs = Seq("sparkling analytics engine", "abc", "ab", "the same the same")
      .toDF("text")
    val viaExpr = docs
      .withColumn("sig", MinHash.minhashSignature(col("text")))
      .select(col("text"), col("sig"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[String](1))).toMap
    val viaHof = docs.selectExpr("text",
      """CASE WHEN length(text) >= 3 THEN
           transform(sequence(0, 3), j ->
             array_min(transform(sequence(1, length(text) - 2),
               i -> substring(md5(substring(text, i, 3)), cast(j * 8 + 1 as int), 8))))
         END AS sig""")
      .collect().map(r => r.getString(0) -> Option(r.getSeq[String](1))).toMap
    assert(viaExpr === viaHof)
    assert(viaExpr("ab").isEmpty) // too short for a shingle → null
  }

  test("MinHashSignature kernel: dup shingles don't change the minimum") {
    val a = MinHashKernel.signature(UTF8String.fromString("abcabcabc"), 4)
    val b = MinHashKernel.signature(UTF8String.fromString("abc" * 50), 4)
    assert(a != null && b != null)
    // same shingle set {abc, bca, cab} → same signature
    assert((0 until 4).forall(i => a.getUTF8String(i) == b.getUTF8String(i)))
  }

  test("TopKAggregator: bounded, ordered, deterministic on ties") {
    val agg = new TopKAggregator(3)
    val rows = Seq(
      Scored(5, 0.9), Scored(1, 0.5), Scored(2, 0.5), Scored(9, 0.1),
      Scored(3, 0.5), Scored(7, 0.99))
    val viaReduce = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(viaReduce) ===
      Seq(Scored(7, 0.99), Scored(5, 0.9), Scored(1, 0.5)))
    // merge of arbitrary splits gives the same answer
    val (l, r) = rows.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) === agg.finish(viaReduce))
  }

  test("TopKAggregator heap == sort-based reference for random k, n, splits") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val k = 1 + rnd.nextInt(20)
      val n = rnd.nextInt(200)
      // duplicate scores on purpose so the vec_id tiebreak is exercised
      val rows = Seq.fill(n)(Scored(rnd.nextInt(50).toLong, rnd.nextInt(10) / 10.0))
      val expected = rows.sortWith((a, b) =>
        a.score > b.score || (a.score == b.score && a.vec_id < b.vec_id)).take(k)

      val agg = new TopKAggregator(k)
      assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)) === expected)

      // merge of arbitrary 3-way splits gives the same answer
      val (a, rest) = rows.splitAt(rnd.nextInt(n + 1))
      val (b, c) = rest.splitAt(rnd.nextInt(rest.length + 1))
      val merged = agg.merge(
        agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)),
        c.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === expected)
    }
  }
}
