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

  test("GramCodeKernel: codes are a sorted bijective image of the gram set") {
    import spark.implicits._
    val shingles =
      "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))"
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").limit(200)
      .union(Seq("ab", "abc", "a💡b💡c", "the same the same").toDF("text"))
    // cardinality: |codes| == |distinct string grams| (injectivity over
    // real text + non-BMP), and the array arrives sorted ascending
    val bad = docs
      .withColumn("codes", Jaccard.gramCodes3(col("text")))
      .withColumn("nStr", expr(
        s"CASE WHEN length(text) >= 3 THEN size($shingles) END"))
      .filter(!(size(col("codes")).cast("int") <=> col("nStr")) ||
        coalesce(expr(
          // sequence(1, 0) DESCENDS, so guard the single-gram case
          "size(codes) >= 2 AND " +
            "exists(sequence(1, size(codes) - 1), i -> codes[i] <= codes[i - 1])"),
          lit(false)))
      .count()
    assert(bad === 0L, "gram_codes3 diverges from the distinct string gram set")
    // pairwise: sorted-merge intersection == string-set intersection ==
    // jaccard3's n_common, on every pair of a real sample
    val sample = docs.limit(40)
    val mism = sample.as("a").crossJoin(sample.as("b"))
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
      .filter(length(col("ta")) >= 3 && length(col("tb")) >= 3)
      .withColumn("viaCodes", Jaccard.sortedIntersectCount(
        Jaccard.gramCodes3(col("ta")), Jaccard.gramCodes3(col("tb"))))
      .withColumn("viaText", Jaccard.jaccard3(col("ta"), col("tb"))
        .getField("n_common"))
      .filter(not(col("viaCodes") <=> col("viaText"))).count()
    assert(mism === 0L, "sorted_intersect_count diverges from jaccard3")
  }

  test("PayloadSigKernel matches the HOF sampling formulation, incl. real docs") {
    import spark.implicits._
    val synth = Seq("a", "abc", "key agg row scan slow fast", "zzzz  zz",
      "0123456789" * 40, "Mixed CASE with, punct! and 123",
      "ユニコード混じり ā é 漢字 text", "\ud83d\ude00 emoji start")
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").collect().map(_.getString(0)).take(100)
    val docs = (synth ++ real).toDF("text").filter(length(col("text")) >= 1)
    val viaKernel = docs
      .select(col("text"), PayloadSig.packedSig(col("text")).as("pk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaHof = docs.selectExpr("text",
      """aggregate(
           transform(sequence(0, 63),
             i -> least(ascii(substring(text, cast(1 + (i * length(text)) div 64 as int), 1)) div 32, 7)),
           0L, (acc, c) -> acc + shiftleft(1L, cast(7 * c as int))) AS pk""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaKernel === viaHof)
  }

  test("MinHashFast matches the universal-family builtin replay (the q58 oracle's math)") {
    import spark.implicits._
    val docs = Seq(
      "sparkling analytics engine", "abc", "ab", "the same the same",
      "💡🎉🚀x", "naïve 💡 text", "日本語テキスト🚀"
    ).toDF("text")
    val k = 6
    val shingles =
      "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))"
    val gh = "((cast(ascii(substring(g, 1, 1)) as bigint) * 961 + " +
      "cast(ascii(substring(g, 2, 1)) as bigint) * 31 + " +
      "cast(ascii(substring(g, 3, 1)) as bigint)) * 2654435761) % 4294967296"
    val perSeed = (0 until k).map { j =>
      s"array_min(transform($shingles, g -> " +
        s"(${MinHashKernel.seedA(j)} * ($gh) + ${MinHashKernel.seedB(j)}) % ${MinHashKernel.UniversalP}))"
    }
    val bad = docs
      .withColumn("fast", MinHash.minhashFast(col("text"), k))
      .withColumn("slow", expr(
        s"CASE WHEN length(text) >= 3 THEN array(${perSeed.mkString(", ")}) END"))
      .filter(not(col("fast") <=> col("slow"))).count()
    assert(bad === 0L, "minhash_fast diverges from the universal builtin replay")
  }

  test("kernels shingle by code point: non-BMP text matches the builtin replay") {
    import spark.implicits._
    // emoji are surrogate PAIRS in java.lang.String but single code
    // points to Spark's substring()/length() and DuckDB's substr() —
    // the builtin formulations below are exactly what the oracles
    // replay, so kernel == builtin here means kernel == oracle on
    // non-BMP input
    val docs = Seq(
      "💡🎉🚀x", // 4 code points, 7 UTF-16 units
      "naïve 💡 text",
      "日本語テキスト🚀",
      "ab💡", // exactly 3 code points → exactly one shingle
      "ab", // 2 code points → no shingles → null
      "💡💡💡a").toDF("text")

    val shingles =
      "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))"

    val mhBad = docs
      .withColumn("fast", MinHash.minhashK(col("text"), 4))
      .withColumn("slow", expr(
        s"""CASE WHEN length(text) >= 3 THEN
              transform(sequence(0, 3), j ->
                array_min(transform($shingles,
                  g -> substring(md5(concat(cast(j as string), ':', g)), 1, 8))))
            END"""))
      .filter(not(col("fast") <=> col("slow"))).count()
    assert(mhBad === 0L, "minhash_k diverges from the code-point builtin replay")

    val sigBad = docs
      .withColumn("fast", MinHash.minhashSignature(col("text")))
      .withColumn("slow", expr(
        s"""CASE WHEN length(text) >= 3 THEN
              transform(sequence(0, 3), j ->
                array_min(transform($shingles,
                  g -> substring(md5(g), cast(j * 8 + 1 as int), 8))))
            END"""))
      .filter(not(col("fast") <=> col("slow"))).count()
    assert(sigBad === 0L, "minhash_signature diverges from the code-point builtin replay")

    val jacBad = docs.as("a").crossJoin(docs.as("b"))
      .select(col("a.text").as("ta"), col("b.text").as("tb"))
      .withColumn("fast", Jaccard.jaccard3(col("ta"), col("tb")).getField("n_common"))
      .withColumn("slow", expr(
        s"""CASE WHEN length(ta) >= 3 AND length(tb) >= 3 THEN
              cast(size(array_intersect(
                ${shingles.replace("text", "ta")},
                ${shingles.replace("text", "tb")})) as bigint)
            END"""))
      .filter(not(col("fast") <=> col("slow"))).count()
    assert(jacBad === 0L, "jaccard3 diverges from the code-point builtin replay")

    // simhash: one shingle of "ab💡" votes every bit of its hash; the
    // hash must pack CODE POINTS (ascii() semantics), not char codes
    val one = SimHashKernel.simhash(UTF8String.fromString("ab💡"))
    val packed = ('a' * 961 + 'b' * 31 + 0x1F4A1).toLong
    val h = (packed * 2654435761L) % 4294967296L
    assert(one === (h & 0xffffL),
      "single-shingle simhash must equal the low 16 bits of the code-point hash")
    // surrogate-splitting would have produced a different shingle count:
    // 4 code points → 2 distinct shingles, never 5 UTF-16-based ones
    assert(SimHashKernel.simhash(UTF8String.fromString("ab💡cd")) !== -1L)
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
