package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The structured-log line format: machine-splittable key=value with
  * the event name first (the reference's logging.py analogue,
  * structured instead of prose). */
class LogSpec extends AnyFunSuite {

  private def fmt(event: String, fields: (String, Any)*): String = {
    // exercise the private formatter through the public API by
    // capturing via a throwaway logger is overkill — replicate the
    // contract here and pin Log against it reflectively
    val m = Log.getClass.getDeclaredMethods
      .find(_.getName == "fmt").get
    m.setAccessible(true)
    m.invoke(Log, event, fields.toSeq).asInstanceOf[String]
  }

  test("plain values render unquoted, event leads") {
    assert(fmt("bronze_done", "pages" -> 3, "records" -> 8) ===
      "event=bronze_done pages=3 records=8")
  }

  test("values with spaces or quotes are quoted and escaped") {
    assert(fmt("x", "msg" -> "two words") === "event=x msg=\"two words\"")
    assert(fmt("x", "msg" -> "say \"hi\"") === "event=x msg=\"say \\\"hi\\\"\"")
  }

  test("values with '=' or newlines stay machine-splittable") {
    // '=' quotes (else `path=a=b` splits ambiguously); newlines escape
    // (one event per line); empty values quote (else the token drops)
    assert(fmt("x", "path" -> "a=b") === "event=x path=\"a=b\"")
    assert(fmt("x", "msg" -> "l1\nl2") === "event=x msg=\"l1\\nl2\"")
    assert(fmt("x", "msg" -> "a\r\nb") === "event=x msg=\"a\\r\\nb\"")
    assert(fmt("x", "v" -> "") === "event=x v=\"\"")
  }

  test("setup accepts the reference's level strings without throwing") {
    Log.setup("DEBUG")
    Log.setup("INFO") // restore
    Log.info("log_spec_probe", "ok" -> true)
  }
}
