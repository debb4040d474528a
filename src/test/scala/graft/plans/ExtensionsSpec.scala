package graft.plans

import graft.SparkSpec
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("minhash_signature usable from SQL after registration") {
    GraftExtensions.register(spark)
    val sig = spark.sql(
      "SELECT minhash_signature('sparkling analytics engine') AS sig")
      .head().getSeq[String](0)
    assert(sig.length === 4)
    assert(sig.forall(_.matches("[0-9a-f]{8}")))
    // two-arg form
    assert(spark.sql("SELECT minhash_signature('abcdef', 2) AS s")
      .head().getSeq[String](0).length === 2)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val big = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"))
      .toDF("k", "v")
    val small = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "w")
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salts = 4)
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    val plain = big.join(small, "k")
      .select("k", "v", "w").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 4)
  }
}
