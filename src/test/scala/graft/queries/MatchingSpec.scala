package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic contracts for the matching queries, beyond the value-level
  * oracle: the blocked fuzzy join loses nothing INSIDE its blocking
  * contract, and sparse cosine's outputs respect the cosine bounds.
  */
class MatchingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q75: blocked result equals the naive quadratic join within the block contract") {
    val blocked = SparkEntry.queries("q75_fuzzy_names")(spark, sf)
    val names = Tables.load(spark, sf, "part")
      .groupBy("p_name").agg(count(lit(1)).as("n"))
    // naive all-pairs over the name vocabulary (64² — fine in a test),
    // restricted to the documented blocking contract (shared last token)
    val a = names.select(col("p_name").as("name_a"), col("n").as("n_a"))
    val b = names.select(col("p_name").as("name_b"), col("n").as("n_b"))
    val naive = a.crossJoin(b)
      .filter(col("name_b") > col("name_a"))
      .filter(element_at(split(col("name_a"), " "), -1) ===
        element_at(split(col("name_b"), " "), -1))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 4)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
    assert(blocked.exceptAll(naive).isEmpty && naive.exceptAll(blocked).isEmpty)
  }

  test("q76: cosine stays in (0, 1], pairs are canonical, sharing >= 1 term") {
    val rows = SparkEntry.queries("q76_sparse_cosine")(spark, sf)
      .agg(min("cosine"), max("cosine"), min(col("doc_b") - col("doc_a")),
        min("n_shared"), count(lit(1))).head
    assert(rows.getLong(4) > 0, "calibration: result must be non-empty")
    assert(rows.getDouble(0) > 0.0)
    assert(rows.getDouble(1) <= 1.0 + 1e-9, s"cosine > 1: $rows")
    assert(rows.getLong(2) >= 1, "doc_a < doc_b canonical order")
    assert(rows.getLong(3) >= 1)
  }

  test("q78: reference-half documents score with zero OOV") {
    // the LM is trained on doc_id % 10 < 5 — those same docs can never
    // contain a bigram the LM has not seen
    val oov = SparkEntry.queries("q78_bigram_lm")(spark, sf)
      .filter(col("doc_id") % 10 < 5)
      .agg(sum("n_oov")).head.getLong(0)
    assert(oov === 0L)
  }

  test("q79: per-source cap holds and ranks are dense from 1") {
    val df = SparkEntry.queries("q79_source_cap")(spark, sf)
    val bad = df.filter(col("kept") =!= (col("rn") <= 20)).count()
    assert(bad === 0L)
    val perSrc = df.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nkept"))
    assert(perSrc.filter(col("mx") =!= col("n")).count() === 0L,
      "ranks must be a dense 1..n per source")
    assert(perSrc.filter(col("nkept") > 20).count() === 0L)
  }

  test("q113: dense top-10 per query, RRF bounds, descending by rank") {
    val df = SparkEntry.queries("q113_rrf_fusion")(spark, sf).cache()
    // exactly 10 fused hits per query, ranks dense 1..10
    val perQ = df.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(perQ.count() === 3L)
    assert(perQ.filter(col("n") =!= 10 || col("mx") =!= 10 || col("mn") =!= 1)
      .count() === 0L)
    // every fused item carries >= 1 list contribution of rank <= 20, so
    // rrf in [1e6 div 80, 2 * (1e6 div 61)]
    val b = df.agg(min("rrf"), max("rrf")).head
    assert(b.getLong(0) >= 1000000L / 80)
    assert(b.getLong(1) <= 2 * (1000000L / 61))
    // rrf is non-increasing in rank within each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rnk")
    val incr = df.withColumn("prev", lag("rrf", 1).over(w))
      .filter(col("prev").isNotNull && col("rrf") > col("prev")).count()
    assert(incr === 0L)
    df.unpersist()
  }

  test("q161: sorted-neighborhood pairs replay from a collected sort") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val counts = Tables.load(spark, sf, "part")
      .groupBy("p_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = counts.keys.toSeq.groupBy(_.head).flatMap { case (_, blk) =>
      val sorted = blk.sorted
      sorted.indices.flatMap { i =>
        Seq(1, 2).flatMap { gap =>
          if (i + gap < sorted.length) {
            val (a, b) = (sorted(i), sorted(i + gap))
            val d = lev(a, b)
            if (d <= 4) Some((a, b, gap.toLong, d.toLong, counts(a), counts(b)))
            else None
          } else None
        }
      }
    }.toSet
    val got = SparkEntry.queries("q161_sorted_neighborhood")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === truth)
    assert(truth.nonEmpty, "calibration: window must produce candidates")
    // window contract: every pair shares a first letter and collates forward
    got.foreach { case (a, b, gap, _, _, _) =>
      assert(a.head === b.head && a < b && (gap === 1L || gap === 2L))
    }
  }
}
