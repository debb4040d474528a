package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end medallion run on an injected page source with dirty rows
  * (FIXTURES.md A); covers S1–S4, K1–K5, P*, F*, W1, G1–G7, D1–D3. */
class PipelineE2ESpec extends SparkSpec {

  /** Three pages: page sizes 3,3,2 with per_page=3 (short page ends the
    * no-Link walk); includes dup ids, blanks, bad lat/long, and a
    * state_province fallback. */
  private object FakeSource extends Bronze.PageSource {
    private val pages = Map(
      1 -> """[
        {"id":"b1","name":"Alpha","brewery_type":"micro","country":"US","state":"CA","city":"LA","postal_code":"1","latitude":"34.0","longitude":"-118.0"},
        {"id":"b2","name":"  Beta  ","brewery_type":" brewpub ","country":" US ","state":"","state_province":"NY","city":"NYC","postal_code":"2","latitude":"40.7","longitude":"-74.0"},
        {"id":"b1","name":"Alpha","brewery_type":"micro","country":"US","state":"CA","city":"LA","postal_code":"1","latitude":"34.0","longitude":"-118.0"}]""",
      2 -> """[
        {"id":"b3","name":"Gamma","brewery_type":"nano","country":"DE","state":"BY","city":"M","postal_code":"3","latitude":"999","longitude":"11.5"},
        {"id":"b4","name":"","brewery_type":"micro","country":"US","state":"CA"},
        {"id":"b5","name":"Eps","brewery_type":"micro","country":"US","state":"CA","latitude":"not-a-number","longitude":""}]""",
      3 -> """[
        {"id":"b6","name":"Zeta","brewery_type":"large","country":"US","state":"TX","city":"A","postal_code":"6","latitude":"30.2","longitude":"-97.7"},
        {"id":"b7","name":"Eta","brewery_type":"micro","country":"US","state":"TX"}]""")

    var calls: List[Int] = Nil

    override def fetch(page: Int, perPage: Int): Bronze.Page = {
      calls = page :: calls
      val body = pages.getOrElse(page, "[]")
      val n = if (pages.contains(page)) (if (page == 3) 2 else 3) else 0
      Bronze.Page(body, n, None)
    }
  }

  private def settings(root: String) = Settings(
    lakeRoot = s"$root/lake",
    bronzePrefix = "bronze-layer", silverPrefix = "silver-layer",
    goldPrefix = "gold-layer", warehouseRoot = s"$root/warehouse",
    apiUrl = "http://unused", perPage = 3)

  test("full pipeline: dirty pages → silver rows → gold counts; rerun idempotent") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val st = settings(root)
    val d = "2026-01-15"

    val report = Pipeline.run(spark, st, FakeSource, Some(d), retryDelayMs = 0)

    assert(report.pages === 3)
    assert(report.records === 8)
    // b1 dedup'd; b3 dropped (lat 999); b4 dropped (blank name) → b1,b2,b5,b6,b7
    assert(report.silverRows === 5)
    assert(report.allChecksPassed, report.checks.toString)

    // silver layout: ingestion_date root partitioned by country/state
    val silver = spark.read.parquet(st.silverDir(d))
    assert(silver.schema.fieldNames.toSet ===
      Schemas.silver.fieldNames.toSet)
    // state_province fallback surfaced in the partition column
    assert(silver.filter(col("id") === "b2").head().getAs[String]("state") === "NY")

    // gold warehouse: this run's slice
    val hist = spark.read.parquet(st.warehouseTableDir)
      .filter(col("ingestion_date") === to_date(lit(d)))
    val counts = hist.collect()
      .map(r => (r.getAs[String]("country"), r.getAs[String]("state"),
        r.getAs[String]("brewery_type")) -> r.getAs[Long]("brewery_count"))
      .toMap
    assert(counts(("US", "CA", "micro")) === 2) // b1, b5
    assert(counts(("US", "NY", "brewpub")) === 1)
    assert(counts(("US", "TX", "large")) === 1)
    assert(counts(("US", "TX", "micro")) === 1)
    assert(counts.values.sum === 5)

    // exports exist at all four grains
    val byType = spark.read.parquet(s"${st.goldBaseDir(d)}/by_type")
    assert(byType.agg(sum("brewery_count")).head().getLong(0) === 5)

    // idempotent rerun: same end state, no duplication (D1/D2)
    val report2 = Pipeline.run(spark, st, FakeSource, Some(d), retryDelayMs = 0)
    assert(report2.silverRows === 5)
    val hist2 = spark.read.parquet(st.warehouseTableDir)
      .filter(col("ingestion_date") === to_date(lit(d)))
    assert(hist2.agg(sum("brewery_count")).head().getLong(0) === 5)

    // a second date accumulates history instead of replacing it
    val d2 = "2026-01-16"
    Pipeline.run(spark, st, FakeSource, Some(d2), retryDelayMs = 0)
    val allHist = spark.read.parquet(st.warehouseTableDir)
    assert(allHist.select("ingestion_date").distinct().count() === 2)
  }

  test("file-driven quality suite: conf/quality-checks.yml replays the in-code checks") {
    val root = Files.createTempDirectory("graft-qc").toString
    val st = settings(root).copy(qualityChecksPath = Some("conf/quality-checks.yml"))
    val report = Pipeline.run(spark, st, FakeSource, Some("2026-01-17"), retryDelayMs = 0)
    assert(report.allChecksPassed, report.checks.toString)
    // the shipped file reproduces the reference's two suites name-for-name
    assert(report.checks.map(_.name) ===
      (Quality.silverSuite ++ Quality.goldSuite).map(_.name))
  }

  test("quality check parser: custom bounds parse, garbage fails loudly") {
    val suites = Quality.parseSuites(
      """# site-edited suite
        |checks for silver_breweries:
        |  - row_count > 10
        |  - max(latitude) > -90
        |
        |checks for gold_breweries_counts:
        |  - max(brewery_count) > 0
        |""".stripMargin)
    assert(suites(Quality.SilverDataset) === Seq(
      Quality.Check("silver_row_count_gt_10", Quality.RowCount, 10L),
      Quality.Check("silver_max_latitude_gt_-90", Quality.MaxOf("latitude"), -90L)))
    assert(suites(Quality.GoldDataset) === Seq(
      Quality.Check("gold_max_brewery_count_gt_0", Quality.MaxOf("brewery_count"), 0L)))
    // a dropped expectation is a check that never runs — refuse to parse
    intercept[RuntimeException](Quality.parseSuites("checks for x:\n  - avg(y) > 0"))
    intercept[RuntimeException](Quality.parseSuites("  - row_count > 0"))
  }

  test("named-datasource configuration: selection, env interpolation, failure modes") {
    // the shipped file mirrors soda/configuration.yml shape-for-shape
    val shipped = new String(Files.readAllBytes(
      java.nio.file.Paths.get("conf/quality-configuration.yml")), "UTF-8")
    val noEnv = Quality.parseConfiguration(shipped, _ => None)
    assert(noEnv === Quality.DataSource("warehouse", "parquet", "/data/warehouse"))
    val withEnv = Quality.parseConfiguration(shipped,
      Map("WAREHOUSE_ROOT" -> "/tmp/elsewhere").get)
    assert(withEnv.path === "/tmp/elsewhere")
    // a half-configured datasource must fail loudly, never fall back
    intercept[RuntimeException](
      Quality.parseConfiguration("data_sources:\n  a:\n    type: parquet"))
    intercept[RuntimeException](
      Quality.parseConfiguration("data_source: missing\ndata_sources:\n  other:\n    type: parquet\n    path: /x"))
  }

  test("quality run reads the warehouse THROUGH the configured datasource") {
    val root = Files.createTempDirectory("graft-qds").toString
    // config whose datasource points at this run's warehouse root —
    // the warehouse scan must resolve through it (a bogus path here
    // would fail the read; a silently ignored config would too,
    // because the settings warehouse root is the same — so point the
    // settings at a WRONG root and let only the datasource be right)
    val st0 = settings(root)
    val conf = Files.createTempFile("graft-qconf", ".yml")
    Files.write(conf,
      s"""data_source: warehouse
         |data_sources:
         |  warehouse:
         |    type: parquet
         |    path: "${st0.warehouseRoot}"
         |""".stripMargin.getBytes("UTF-8"))
    val report = Pipeline.run(spark, st0, FakeSource, Some("2026-01-18"),
      retryDelayMs = 0)
    assert(report.allChecksPassed)
    // now run ONLY the quality stage with settings whose warehouse
    // root is wrong; the datasource must rescue the read
    val broken = st0.copy(warehouseRoot = s"$root/nowhere",
      qualityConfigPath = Some(conf.toString))
    val checks = Quality.run(spark, broken, "2026-01-18")
    assert(checks.nonEmpty && checks.forall(_.passed),
      s"datasource-resolved warehouse scan must pass: $checks")
  }

  test("no-Link pagination stops on short page") {
    FakeSource.calls = Nil
    val root = Files.createTempDirectory("graft-pg").toString
    val (pages, records) =
      Bronze.ingest(spark, settings(root), FakeSource, "2026-02-01")
    assert(pages === 3 && records === 8)
    // short page 3 (2 < per_page 3) stopped the walk — page 4 never fetched
    assert(!FakeSource.calls.contains(4))
  }
}
