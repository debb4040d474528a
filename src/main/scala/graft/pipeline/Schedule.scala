package graft.pipeline

import java.time.{Instant, LocalDate, ZoneOffset, ZonedDateTime}

/** Deployment registration + schedule binding — the engine-scope
  * analogue of the reference's orchestrator deployment
  * (/root/reference/prefect.yaml:5-13: named deployment, parameters,
  * tags, `schedules: []` = manual; worker registration in
  * /root/reference/entrypoint.sh:48-105, which passes `cron=None` for
  * manual runs but supports a cron binding).
  *
  * The schedule math is a PURE function of (spec, now) so specs can
  * pin fire times without threads or real clocks; the worker loop
  * takes an injected clock + sleeper for the same reason. Supported
  * spec grammar is the subset the reference's deployment would use:
  * `@hourly`, `@daily`, or a 5-field cron of integers and `*`
  * (minute hour day-of-month month day-of-week; day-of-week 0 = Sunday,
  * UTC). Field semantics follow vixie cron: all fields are ANDed,
  * EXCEPT that when day-of-month and day-of-week are BOTH restricted
  * the day matches if EITHER does (`0 0 13 * 5` fires every 13th AND
  * every Friday, not only Friday-the-13th).
  */
object Schedule {

  /** One parsed cron constraint set; `None` = `*` (any). */
  final case class Cron(
      minute: Option[Int],
      hour: Option[Int],
      dayOfMonth: Option[Int],
      month: Option[Int],
      dayOfWeek: Option[Int])

  /** A registered deployment: name + parameters + tags + optional
    * schedule (None = manual, the reference's `schedules: []`). */
  final case class Deployment(
      name: String,
      tags: Seq[String],
      ingestionDate: Option[String],
      schedule: Option[Cron])

  def parse(spec: String): Cron = spec.trim match {
    case "@hourly" => Cron(Some(0), None, None, None, None)
    case "@daily" => Cron(Some(0), Some(0), None, None, None)
    case s =>
      val fields = s.split("\\s+")
      require(fields.length == 5, s"cron needs 5 fields, got: '$s'")
      def f(i: Int, lo: Int, hi: Int): Option[Int] = fields(i) match {
        case "*" => None
        case n if n.forall(_.isDigit) && n.nonEmpty =>
          val v = n.toInt
          require(v >= lo && v <= hi, s"cron field $i out of [$lo,$hi]: $v")
          Some(v)
        case other =>
          throw new IllegalArgumentException(
            s"cron field $i: '$other' unsupported — this grammar accepts only " +
              "a single integer or '*' per field (no ranges '1-5', " +
              "steps '*/5', or lists '1,2')")
      }
      Cron(f(0, 0, 59), f(1, 0, 23), f(2, 1, 31), f(3, 1, 12), f(4, 0, 6))
  }

  /** Vixie day rule: dom AND dow each match when unrestricted; when
    * BOTH are restricted the day matches if EITHER does. */
  private def dayMatches(c: Cron, t: ZonedDateTime): Boolean =
    (c.dayOfMonth, c.dayOfWeek) match {
      case (Some(dom), Some(dow)) =>
        dom == t.getDayOfMonth || dow == t.getDayOfWeek.getValue % 7
      case _ =>
        c.dayOfMonth.forall(_ == t.getDayOfMonth) &&
          c.dayOfWeek.forall(_ == t.getDayOfWeek.getValue % 7)
    }

  private def matches(c: Cron, t: ZonedDateTime): Boolean =
    c.minute.forall(_ == t.getMinute) &&
      c.hour.forall(_ == t.getHour) &&
      c.month.forall(_ == t.getMonthValue) &&
      dayMatches(c, t)

  /** Earliest whole minute strictly after `after` matching the spec.
    * Minute-stepping is bounded by the longest possible gap (a yearly
    * Feb-29-like spec still fires within 8 years of minutes). */
  def next(c: Cron, after: Instant): Instant = {
    var t = after.atZone(ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    var budget = 8L * 366 * 24 * 60
    // skip whole days/hours cheaply before the minute walk
    while (budget > 0 && !matches(c, t)) {
      if (c.month.exists(_ != t.getMonthValue) || !dayMatches(c, t)) {
        t = t.plusDays(1).withHour(0).withMinute(0); budget -= 24 * 60
      } else if (c.hour.exists(_ != t.getHour)) {
        t = t.plusHours(1).withMinute(0); budget -= 60
      } else { t = t.plusMinutes(1); budget -= 1 }
    }
    require(budget > 0, s"unsatisfiable cron: $c")
    t.toInstant
  }

  def fromEnv(env: Map[String, String] = sys.env): Deployment = Deployment(
    name = env.getOrElse("DEPLOY_NAME", "graft-medallion-deploy"),
    tags = env.get("DEPLOY_TAGS").map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("dev", "graft")),
    ingestionDate = env.get("DEPLOY_INGESTION_DATE").filter(_.nonEmpty),
    schedule = env.get("DEPLOY_CRON").filter(_.nonEmpty).map(parse))

  /** The worker loop (entrypoint.sh's `prefect worker start` analogue):
    * a manual deployment runs exactly once, NOW (the reference's
    * on-demand `prefect deployment run`); a scheduled one sleeps to
    * each fire time and runs with the fire date as ingestion_date
    * unless the deployment pins one. `clock`/`sleeper` are injected so
    * the loop is deterministic under test; `maxRuns` bounds it (a
    * production worker passes Int.MaxValue).
    */
  def runWorker(
      d: Deployment,
      run: String => Unit,
      clock: () => Instant,
      sleeper: Long => Unit,
      maxRuns: Int): Int = {
    def dateOf(i: Instant): String =
      LocalDate.ofInstant(i, ZoneOffset.UTC).toString
    d.schedule match {
      case None =>
        run(d.ingestionDate.getOrElse(dateOf(clock())))
        1
      case Some(c) =>
        var runs = 0
        while (runs < maxRuns) {
          val fire = next(c, clock())
          val waitMs = fire.toEpochMilli - clock().toEpochMilli
          if (waitMs > 0) sleeper(waitMs)
          run(d.ingestionDate.getOrElse(dateOf(fire)))
          runs += 1
        }
        runs
    }
  }
}
