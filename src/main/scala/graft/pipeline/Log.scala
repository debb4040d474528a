package graft.pipeline

/** Structured pipeline logging — the engine-side analogue of the
  * reference's logging setup (/root/reference/app/utils/logging.py:4-11,
  * a stdout handler with a timestamp/level/name format). Two deltas,
  * both deliberate:
  *
  *   - events are STRUCTURED `key=value` pairs on one line (event
  *     name first), so a log aggregator parses stages, counts and
  *     durations without regexes over prose — the operational shape a
  *     1000-executor deployment needs, where driver logs are the only
  *     serial narrative of a run;
  *   - the sink is slf4j → log4j2 (Spark's own logging stack), so
  *     level, routing and layout stay under the cluster's log4j2
  *     configuration rather than a second config system. `setup()`
  *     mirrors the reference's level knob for standalone (non-Spark)
  *     entry points.
  *
  * Values render via `String.valueOf`; embedded spaces are quoted so
  * the line stays machine-splittable.
  */
object Log {

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.pipeline")

  /** Mirrors `setup_logging(level)`: set the root log4j2 level once at
    * a standalone entry point. On a cluster the log4j2 config wins —
    * this is the local-run convenience, same as the reference's. */
  def setup(level: String = "INFO"): Unit = {
    val l = org.apache.logging.log4j.Level.toLevel(level, org.apache.logging.log4j.Level.INFO)
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(l)
  }

  private def fmt(event: String, fields: Seq[(String, Any)]): String = {
    val kv = fields.map { case (k, v) =>
      val raw = String.valueOf(v)
      // newlines escape (one event per line); '=' and spaces quote so
      // key=value splitting stays unambiguous for any value content
      val s = raw.replace("\r", "\\r").replace("\n", "\\n")
      val quoted = if (s.isEmpty || raw != s ||
          s.exists(c => c == ' ' || c == '"' || c == '=')) {
        "\"" + s.replace("\"", "\\\"") + "\""
      } else s
      s"$k=$quoted"
    }
    (s"event=$event" +: kv).mkString(" ")
  }

  def info(event: String, fields: (String, Any)*): Unit =
    logger.info(fmt(event, fields))

  def warn(event: String, fields: (String, Any)*): Unit =
    logger.warn(fmt(event, fields))

  def error(event: String, t: Throwable, fields: (String, Any)*): Unit =
    logger.error(fmt(event, fields), t)
}
