package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NgramsSpec extends SparkSpec {

  test("TokenNgrams matches the HOF formulation (the oracle's math)") {
    import spark.implicits._
    val docs = Seq(
      "a b c d e f g",          // normal
      "a b c d e",              // exactly k tokens (k=5)
      "a b c",                  // shorter than k -> empty
      "",                       // empty text -> one empty token
      "x  y z q r s",           // double space -> empty token kept
      "a b a b a b a b",        // repeated grams -> distinct
      "héllo wörld ñ ü ß emojié end"  // non-ASCII
    ).toDF("text")
    for (k <- Seq(2, 5)) {
      val viaKernel = docs.select(col("text"),
          Ngrams.tokenNgrams(col("text"), k).as("gs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val viaHof = docs.selectExpr("text",
          s"""CASE WHEN size(split(text, ' ')) >= $k THEN
                array_distinct(transform(sequence(1, size(split(text, ' ')) - ${k - 1}),
                  i -> concat_ws(' ', slice(split(text, ' '), i, $k))))
              ELSE array() END AS gs""")
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(viaKernel === viaHof, s"k=$k")
    }
  }
}
