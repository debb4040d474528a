package graft.pipeline

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Deployment schedule binding (/root/reference/prefect.yaml:5-13,
  * worker in entrypoint.sh:48-105): pure next-fire math + the worker
  * loop driven by a fake clock — no threads, no real sleeping. */
class ScheduleSpec extends AnyFunSuite {

  import Schedule._

  test("parse: @-shortcuts, stars, and bounds") {
    assert(parse("@hourly") === Cron(Some(0), None, None, None, None))
    assert(parse("@daily") === Cron(Some(0), Some(0), None, None, None))
    assert(parse("30 3 * * *") === Cron(Some(30), Some(3), None, None, None))
    assert(parse("* * 29 2 *") === Cron(None, None, Some(29), Some(2), None))
    assert(parse("15 6 * * 0") === Cron(Some(15), Some(6), None, None, Some(0)))
    intercept[IllegalArgumentException](parse("1 2 3"))
    intercept[IllegalArgumentException](parse("61 * * * *"))
    // unsupported cron grammar fails with a message naming the subset,
    // not a bare NumberFormatException
    val e = intercept[IllegalArgumentException](parse("*/5 * * * *"))
    assert(e.getMessage.contains("unsupported"))
    intercept[IllegalArgumentException](parse("1-5 * * * *"))
    intercept[IllegalArgumentException](parse("1,2 * * * *"))
  }

  test("vixie day rule: restricted dom+dow fire on EITHER match") {
    def at(s: String) = Instant.parse(s)
    val c = parse("0 0 13 * 5") // every 13th AND every Friday
    // 2026-08-13 is a Thursday; the next match is Friday the 14th (dow),
    // not Friday-the-13th-only conjunction semantics
    assert(next(c, at("2026-08-13T12:00:00Z")) === at("2026-08-14T00:00:00Z"))
    // then the following Friday
    assert(next(c, at("2026-08-14T00:00:00Z")) === at("2026-08-21T00:00:00Z"))
    // 2026-09-13 is a Sunday: fires on the dom leg alone
    assert(next(c, at("2026-09-12T01:00:00Z")) === at("2026-09-13T00:00:00Z"))
    // singly-restricted fields keep plain AND semantics
    assert(next(parse("0 0 13 * *"), at("2026-08-13T12:00:00Z")) ===
      at("2026-09-13T00:00:00Z"))
  }

  test("next: strictly-after semantics and boundary crossings") {
    def at(s: String) = Instant.parse(s)
    val daily = parse("0 3 * * *")
    // before today's fire → today; at the fire minute → tomorrow (strict)
    assert(next(daily, at("2026-08-13T01:00:00Z")) === at("2026-08-13T03:00:00Z"))
    assert(next(daily, at("2026-08-13T03:00:00Z")) === at("2026-08-14T03:00:00Z"))
    assert(next(daily, at("2026-08-13T03:00:30Z")) === at("2026-08-14T03:00:00Z"))
    // month boundary
    assert(next(daily, at("2026-08-31T05:00:00Z")) === at("2026-09-01T03:00:00Z"))
    // hourly from mid-hour
    assert(next(parse("@hourly"), at("2026-08-13T07:59:59Z")) ===
      at("2026-08-13T08:00:00Z"))
    // day-of-week: 2026-08-13 is a Thursday; next Sunday 06:15 is the 16th
    assert(next(parse("15 6 * * 0"), at("2026-08-13T12:00:00Z")) ===
      at("2026-08-16T06:15:00Z"))
    // Feb 29: next leap day after 2026 is 2028
    assert(next(parse("0 0 29 2 *"), at("2026-08-13T00:00:00Z")) ===
      at("2028-02-29T00:00:00Z"))
  }

  test("manual deployment (schedules: []) runs exactly once, now") {
    val ran = collection.mutable.Buffer[String]()
    val d = Deployment("m", Seq("dev"), ingestionDate = None, schedule = None)
    val n = runWorker(d, ran += _,
      clock = () => Instant.parse("2026-08-13T10:00:00Z"),
      sleeper = _ => fail("manual run must not sleep"),
      maxRuns = 5)
    assert(n === 1 && ran.toSeq === Seq("2026-08-13"))
  }

  test("scheduled worker sleeps to each fire and stamps the fire date") {
    var now = Instant.parse("2026-08-13T22:30:00Z")
    val slept = collection.mutable.Buffer[Long]()
    val ran = collection.mutable.Buffer[String]()
    val d = Deployment("s", Seq("dev"), None, Some(parse("@daily")))
    val n = runWorker(d, ran += _,
      clock = () => now,
      sleeper = ms => { slept += ms; now = now.plusMillis(ms) },
      maxRuns = 3)
    assert(n === 3)
    // first fire: tomorrow 00:00 (90 min away); then every 24 h
    assert(slept.toSeq === Seq(90L * 60 * 1000, 24L * 3600 * 1000, 24L * 3600 * 1000))
    assert(ran.toSeq === Seq("2026-08-14", "2026-08-15", "2026-08-16"))
  }

  test("a pinned ingestion_date overrides the fire date") {
    var now = Instant.parse("2026-08-13T22:30:00Z")
    val ran = collection.mutable.Buffer[String]()
    val d = Deployment("p", Nil, Some("2020-01-01"), Some(parse("@daily")))
    runWorker(d, ran += _, () => now,
      ms => now = now.plusMillis(ms), maxRuns = 2)
    assert(ran.toSeq === Seq("2020-01-01", "2020-01-01"))
  }

  test("fromEnv mirrors the deployment registration shape") {
    val d = fromEnv(Map(
      "DEPLOY_NAME" -> "nightly",
      "DEPLOY_TAGS" -> "prod, etl",
      "DEPLOY_CRON" -> "0 3 * * *"))
    assert(d === Deployment("nightly", Seq("prod", "etl"), None,
      Some(Cron(Some(0), Some(3), None, None, None))))
    // defaults: manual (schedules: []), like the reference
    val m = fromEnv(Map.empty)
    assert(m.name === "graft-medallion-deploy" && m.schedule.isEmpty)
  }
}
