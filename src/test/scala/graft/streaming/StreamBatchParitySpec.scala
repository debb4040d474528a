package graft.streaming

import java.nio.file.{Files, Path}

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming/batch parity on the REAL events table: the streaming
  * session_window path (file source → StreamOps.sessionCounts →
  * foreachBatch → parquet) must reproduce, session for session, the
  * batch q24 sessionization — whose DuckDB oracle is green in
  * CORRECTNESS — so the streaming operator is transitively
  * oracle-backed rather than spec-only.
  */
class StreamBatchParitySpec extends SparkSpec {

  private val gapUs = 1800000000L // 30 minutes, matching q23/q24

  /** Stages `events` as two chronologically-ordered source files: all
    * real rows, then one far-future watermark-pusher row (user_id -1)
    * whose arrival closes every real session. */
  private def stageInput(events: DataFrame): Path = {
    val in = Files.createTempDirectory("graft-parity-in")
    def onePart(df: DataFrame, tmpName: String, target: String, mtimeOffsetMs: Long): Unit = {
      val tmp = in.resolve(tmpName)
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      val dst = in.resolve(target)
      Files.move(part, dst)
      dst.toFile.setLastModified(System.currentTimeMillis() + mtimeOffsetMs)
    }
    onePart(events, "stage1", "batch1.parquet", 0L)
    val pusherTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0) +
      gapUs + 900000000L // gap + 15 min — far past every session end + watermark
    onePart(events.sparkSession.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_micros(lit(pusherTs)).as("ts"),
      lit(-1L).as("user_id"),
      lit("pusher").as("event_type")), "stage2", "batch2.parquet", 10000L)
    in
  }

  test("streaming session_window over real events equals batch q24 sessions") {
    val dir = "/root/testdata/sf0.001"
    val events = Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val in = stageInput(events)
    val out = Files.createTempDirectory("graft-parity-out").toString
    val ckpt = Files.createTempDirectory("graft-parity-ckpt").toString

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(in.toString)
    val q = StreamOps.sessionCounts(stream, gap = "30 minutes", watermark = "1 minute")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) batch.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    // session_window's end is last event + gap; subtract it back so the
    // tuple matches q24's (first-to-last) duration exactly
    val streamed = spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"),
        (unix_micros(col("session_end")) - gapUs -
          unix_micros(col("session_start"))).as("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val batch = SparkEntry.queries("q24_session_stats")(spark, dir)
      .select(col("user_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    assert(batch.nonEmpty, "batch sessionization returned no sessions")
    assert(streamed.length === batch.length,
      s"session count mismatch: streaming ${streamed.length} vs batch ${batch.length}")
    assert(streamed === batch)
  }
}
