package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads decoded in
  * batched per-partition passes — the Scala analogue of a
  * mapInPandas decode stage.
  *
  * The real Spark machinery here — typed Datasets over binary columns,
  * mapPartitions batch shape, schema of the decoded output, partition
  * sizing — is production-shaped. Two decode tiers:
  *
  *   - REAL container parsers for RIFF/WAV and BMP ([[parseWav]],
  *     [[parseBmp]], [[wavFrameEnergies]]) — pure byte-layout public
  *     formats need no codec library, so header walk, PCM sample
  *     decode and per-frame energy are fully implemented and
  *     spec-verified against hand-built files.
  *   - A clearly-marked STUB for compressed codecs (this container
  *     ships no image/audio libraries): `decodeFrame` produces a
  *     deterministic fake feature vector from the bytes. A real
  *     deployment swaps only that function (e.g. JNI into libjpeg /
  *     ffmpeg), keeping every Spark-side contract identical.
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

  // ------------------------------------------------------------------
  // REAL container parsers — RIFF/WAV and BMP are pure-byte-layout
  // public formats, so their header+payload parsing needs no codec
  // library: these are production decode paths, not stubs. A payload
  // that parses feeds the REAL per-frame PCM energy; anything else
  // falls back to the disclosed stub codec above. (Spec-verified
  // against hand-built files in BinaryDecodeSpec.)
  // ------------------------------------------------------------------

  /** Parsed RIFF/WAVE header: PCM format fields + the location of the
    * raw sample bytes inside the payload. */
  final case class WavInfo(
      audioFormat: Int,
      numChannels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      dataOffset: Int,
      dataBytes: Int)

  /** Parsed BMP (BITMAPINFOHEADER) header. Height may be negative in
    * a real top-down BMP; `height` keeps the signed value. */
  final case class BmpInfo(
      fileSize: Int,
      pixelOffset: Int,
      width: Int,
      height: Int,
      bitsPerPixel: Int)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Real RIFF/WAVE parser: 'RIFF'<size>'WAVE', then a chunk walk for
    * 'fmt ' (PCM format fields) and 'data' (sample payload). Returns
    * None on any malformed structure — the ingest-gate contract
    * (q242's audit shape): never throw on corpus bytes. */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    // the cursor is a Long: a hostile chunk size near 2^31 would wrap
    // `off + 8 + sz` computed in Int, sneaking a past-the-end chunk
    // through the bounds check (and a multi-GB frame alloc after it)
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val id = tag(b, o)
      val sz = le32(b, o + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16)
        fmt = Some((le16(b, o + 8), le16(b, o + 10),
          le32(b, o + 12), le16(b, o + 22)))
      else if (id == "data")
        data = Some((o + 8, sz))
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8L + sz + (sz & 1)
    }
    for ((af, ch, sr, bps) <- fmt; (dOff, dLen) <- data
         if ch > 0 && sr > 0 && (bps == 8 || bps == 16))
      yield WavInfo(af, ch, sr, bps, dOff, dLen)
  }

  /** Real BMP parser: 'BM' magic, pixel-array offset at byte 10, and
    * the BITMAPINFOHEADER geometry (width/height/bpp). None on any
    * malformed structure. */
  def parseBmp(b: Array[Byte]): Option[BmpInfo] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val fileSize = le32(b, 2)
    val pixOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40 || pixOff < 54 || pixOff > b.length) return None
    val info = BmpInfo(fileSize, pixOff, le32(b, 18), le32(b, 22), le16(b, 28))
    if (info.width <= 0 || info.bitsPerPixel <= 0) None else Some(info)
  }

  /** Real PCM frame energy: decode the WAV's sample stream (8-bit
    * unsigned / 16-bit signed little-endian PCM) and emit one RMS-
    * proportional integer per `frameSamples` window — the actual
    * voice-activity energy a VAD consumes (q190 runs the same
    * gaps-and-islands segmentation over its stubbed energy; this is
    * the drop-in real kernel for true WAV payloads). */
  def wavFrameEnergies(b: Array[Byte], info: WavInfo,
      frameSamples: Int): Array[Long] = {
    require(frameSamples > 0, "frameSamples must be positive")
    val bytesPerSample = info.bitsPerSample / 8
    val n = info.dataBytes / bytesPerSample
    val frames = (n + frameSamples - 1) / frameSamples
    val out = new Array[Long](frames)
    var i = 0
    while (i < n) {
      val off = info.dataOffset + i * bytesPerSample
      val s =
        if (bytesPerSample == 1) (b(off) & 0xff) - 128
        else (le16(b, off) << 16) >> 16 // sign-extend 16-bit LE
      out(i / frameSamples) += s.toLong * s
      i += 1
    }
    out
  }

  /** REAL 8-bit mono PCM WAV writer — the ENCODE half of [[parseWav]]:
    * a canonical 44-byte RIFF/WAVE layout (PCM 'fmt ' chunk, one
    * channel, 8 bits/sample) followed by the raw unsigned sample
    * bytes. The oracle-backed round-trip queries (q271/q272) use it
    * to emit GENUINE containers deterministically from corpus bytes,
    * so the real chunk walk runs under the DuckDB gate: any header-
    * offset or little-endian bug breaks their hash match. */
  def buildWav8(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(36 + samples.length)
      .put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 byte/sample)
      .putShort(1) // block align
      .putShort(8) // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .putInt(samples.length)
    bb.put(samples)
    bb.array()
  }

  /** REAL 24-bit bottom-up BMP writer (BITMAPINFOHEADER, rows padded
    * to 4 bytes, zeroed pixel array) — the ENCODE half of
    * [[parseBmp]], same round-trip role as [[buildWav8]]. */
  def buildBmp24(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "BMP needs positive dimensions")
    val rowBytes = (width * 3 + 3) / 4 * 4
    val pixBytes = rowBytes * height
    val bb = java.nio.ByteBuffer.allocate(54 + pixBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + pixBytes)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(pixBytes).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    bb.array()
  }

  /** Typed decode result of the real-container path. */
  final case class MediaProbe(
      doc_id: Long,
      container: String, // "wav" | "bmp" | "opaque"
      sample_rate: Int,
      channels: Int,
      bits: Int,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Container-dispatch decode: real WAV/BMP payloads parse with the
    * real parsers, everything else reports as opaque (and would flow
    * to the stub codec). Same mapPartitions batch shape as
    * [[decodeFrames]] — a per-partition pure pass, no driver hop. */
  def probeContainers(records: Dataset[MediaRecord],
      frameSamples: Int = 256): Dataset[MediaProbe] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      parseWav(r.payload) match {
        case Some(w) =>
          val frames = wavFrameEnergies(r.payload, w, frameSamples).length
          MediaProbe(r.doc_id, "wav", w.sampleRate, w.numChannels,
            w.bitsPerSample, 0, 0, frames)
        case None => parseBmp(r.payload) match {
          case Some(bm) =>
            MediaProbe(r.doc_id, "bmp", 0, 0, bm.bitsPerPixel,
              bm.width, bm.height, 1)
          case None =>
            MediaProbe(r.doc_id, "opaque", 0, 0, 0, 0, 0,
              (r.payload.length + FrameBytes - 1) / FrameBytes)
        }
      }
    })
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
