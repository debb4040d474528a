package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads decoded in
  * batched per-partition passes — the Scala analogue of a
  * mapInPandas decode stage.
  *
  * The real Spark machinery here — typed Datasets over binary columns,
  * mapPartitions batch shape, schema of the decoded output, partition
  * sizing — is production-shaped. The codec itself is a clearly-marked
  * STUB (this container ships no image/audio libraries): `decodeFrame`
  * produces a deterministic fake feature vector from the bytes. A real
  * deployment swaps only that function (e.g. JNI into libjpeg /
  * ffmpeg), keeping every Spark-side contract identical.
  *
  * Scale notes: decode is embarrassingly parallel and CPU-bound, so the
  * operator repartitions to many small partitions (codec memory per
  * task is bounded by frame size × batch), and the decoded features are
  * columnar-friendly fixed-width arrays.
  */
object BinaryDecode {

  /** Input record: an opaque media payload plus typed metadata. */
  final case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoded output: per-frame fixed-width feature vector. */
  final case class DecodedFrame(
      doc_id: Long,
      frame_no: Int,
      n_bytes: Int,
      features: Array[Double])

  val FrameBytes = 32
  val FeatureDim = 16

  /** STUB CODEC — deterministic fake in place of a real decoder.
    * A real implementation would hand `bytes` to an image/audio
    * library; this one emits a 16-bin byte-value histogram so the
    * plumbing is testable end-to-end. */
  def decodeFrame(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % FeatureDim) += 1.0
      i += 1
    }
    hist
  }

  /** Frame-sample + decode: split each payload into fixed-size frames,
    * decode each frame to a feature vector. One iterator pass per
    * partition — the batch shape a vectorized codec consumes. */
  def decodeFrames(records: Dataset[MediaRecord]): Dataset[DecodedFrame] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { rec =>
        rec.payload.grouped(FrameBytes).zipWithIndex.map {
          case (frame, idx) =>
            DecodedFrame(rec.doc_id, idx, frame.length, decodeFrame(frame))
        }
      }
    }
  }

  /** STUB RESIZE — nearest-neighbor downsample of a payload to exactly
    * `target` bytes (positions i ↦ byte[(i·len) div target]). A real
    * deployment swaps this for an image scaler / audio resampler; the
    * contract — fixed output size, deterministic, pure per-record — is
    * the real one. For len < target, positions repeat (nearest-neighbor
    * upsampling), matching the SQL replay in q84's oracle. */
  def resizePayload(bytes: Array[Byte], target: Int): Array[Byte] = {
    require(target > 0 && bytes.nonEmpty, "resize needs a non-empty payload")
    Array.tabulate(target)(i => bytes((i.toLong * bytes.length / target).toInt))
  }

  /** Batched per-partition resize — same mapPartitions shape as the
    * decode stage, so a codec-backed scaler slots in unchanged. */
  def resizeAll(records: Dataset[MediaRecord], target: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r =>
      MediaRecord(r.doc_id, r.mime, resizePayload(r.payload, target))))
  }

  /** DataFrame entry point: documents → media records (payload
    * synthesized from text in this environment) → decoded frames. */
  def decodeDocuments(spark: SparkSession, documents: DataFrame,
      partitions: Int = 0): Dataset[DecodedFrame] = {
    import spark.implicits._
    val base = documents.select(
      col("doc_id"),
      when(length(col("text")) % 3 === 0, "image/png")
        .when(length(col("text")) % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      col("text").cast("binary").as("payload"))
    val records =
      (if (partitions > 0) base.repartition(partitions) else base)
        .as[MediaRecord]
    decodeFrames(records)
  }
}
