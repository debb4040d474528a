package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Drives the streaming operators end-to-end: file source → transform →
  * memory sink, one AvailableNow pass. */
class StreamingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType, true),
    StructField("ts", TimestampType, true),
    StructField("user_id", LongType, true),
    StructField("event_type", StringType, true),
    StructField("value", DoubleType, true)))

  private def writeInput(rows: String*): String = {
    val dir = Files.createTempDirectory("graft-stream-in")
    Files.writeString(dir.resolve("part-0.json"), rows.mkString("\n"))
    dir.toString
  }

  test("session_window sessionization over a stream") {
    // session_window aggregation only supports append mode: sessions emit
    // once the watermark passes their end. Two micro-batches
    // (maxFilesPerTrigger=1): batch 1 carries the sessions plus a
    // watermark-pusher event at 13:00; batch 2 triggers the emission.
    val dir = Files.createTempDirectory("graft-stream-sess")
    Files.writeString(dir.resolve("a-batch1.json"), Seq(
      """{"event_id":1,"ts":"2026-01-01T10:00:00.000Z","user_id":1,"event_type":"click"}""",
      """{"event_id":2,"ts":"2026-01-01T10:10:00.000Z","user_id":1,"event_type":"view"}""",
      """{"event_id":3,"ts":"2026-01-01T12:00:00.000Z","user_id":1,"event_type":"click"}""",
      """{"event_id":4,"ts":"2026-01-01T10:05:00.000Z","user_id":2,"event_type":"click"}""",
      """{"event_id":5,"ts":"2026-01-01T13:00:00.000Z","user_id":9,"event_type":"click"}""").mkString("\n"))
    val b2 = dir.resolve("b-batch2.json")
    Files.writeString(b2, """{"event_id":6,"ts":"2026-01-01T14:00:00.000Z","user_id":9,"event_type":"click"}""")
    b2.toFile.setLastModified(System.currentTimeMillis() + 10000)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir.toString)
    val q = StreamOps.sessionCounts(stream, gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    // finalized sessions: user 1's two (2 events, then 1), user 2's one,
    // and user 9's 13:00 session (closed by the 13:59 watermark after
    // batch 2); user 9's 14:00 session is still open and never emits
    assert(rows === Seq((1L, 1L), (1L, 2L), (2L, 1L), (9L, 1L)))
  }

  test("streaming dedup by event_id") {
    val in = writeInput(
      """{"event_id":1,"ts":"2026-01-01T10:00:00.000Z","user_id":1,"event_type":"click"}""",
      """{"event_id":1,"ts":"2026-01-01T10:00:00.000Z","user_id":1,"event_type":"click"}""",
      """{"event_id":2,"ts":"2026-01-01T10:01:00.000Z","user_id":1,"event_type":"view"}""")
    val stream = spark.readStream.schema(schema).json(in)
    val q = StreamOps.dedupEvents(stream)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("dedup").count() === 2)
  }

  test("mapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-state")
    Files.writeString(dir.resolve("a-b1.json"), Seq(
      """{"event_id":1,"ts":"2026-01-01T10:00:00.000Z","user_id":1,"event_type":"error"}""",
      """{"event_id":2,"ts":"2026-01-01T10:01:00.000Z","user_id":1,"event_type":"error"}""",
      """{"event_id":3,"ts":"2026-01-01T10:02:00.000Z","user_id":2,"event_type":"click"}""").mkString("\n"))
    val b2 = dir.resolve("b-b2.json")
    Files.writeString(b2, Seq(
      """{"event_id":4,"ts":"2026-01-01T10:03:00.000Z","user_id":1,"event_type":"error"}""",
      """{"event_id":5,"ts":"2026-01-01T10:04:00.000Z","user_id":2,"event_type":"view"}""").mkString("\n"))
    b2.toFile.setLastModified(System.currentTimeMillis() + 10000)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(dir.toString)
      .as[StreamOps.EventRow]
    val q = StreamOps.runningUserStats(stream, flagAfterErrors = 3)
      .writeStream.format("memory").queryName("running")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // last update per user wins: user 1 reaches 3 events / 3 errors
    // (flagged — state carried from batch 1), user 2 reaches 2 / 0
    val last = spark.table("running").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    assert(last(1L) === ((3L, 3L, true)))
    assert(last(2L) === ((2L, 0L, false)))
  }

  test("tumbling hourly counts over a stream") {
    val in = writeInput(
      """{"event_id":1,"ts":"2026-01-01T10:00:00.000Z","user_id":1,"event_type":"click"}""",
      """{"event_id":2,"ts":"2026-01-01T10:59:00.000Z","user_id":2,"event_type":"click"}""",
      """{"event_id":3,"ts":"2026-01-01T11:01:00.000Z","user_id":1,"event_type":"click"}""")
    val stream = spark.readStream.schema(schema).json(in)
    val q = StreamOps.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val m = spark.table("hourly").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    assert(m("2026-01-01 10:00:00.0") === 2)
    assert(m("2026-01-01 11:00:00.0") === 1)
  }
}
