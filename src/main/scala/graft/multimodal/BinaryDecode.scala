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

  // ------------------------------------------------------------------
  // REAL PNG container — the third pure-byte-layout public format
  // (after RIFF/WAV and BMP), and the one the other two lack a story
  // for: CHECKSUM-VALIDATED parsing. Every PNG chunk is
  // length-tagged and carries a CRC32 over its type+data, so the
  // chunk walk here verifies each chunk's integrity before trusting
  // its fields — the ingest-gate posture a 100 TB crawl needs (a
  // truncated or bit-flipped object must be detected, not decoded
  // into garbage). Uses only java.util.zip (CRC32, Inflater): the
  // container layout and zlib framing are public specs (RFC 2083 /
  // RFC 1950-1951), no codec library involved.
  // ------------------------------------------------------------------

  /** Parsed PNG: IHDR geometry + chunk inventory + checksum verdict.
    * `crcOk` is true iff EVERY chunk's stored CRC32 matches the one
    * recomputed over its type+data bytes. */
  final case class PngInfo(
      width: Int,
      height: Int,
      bitDepth: Int,
      colorType: Int,
      nChunks: Int,
      idatBytes: Int,
      crcOk: Boolean)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Real PNG chunk walk: verify the 8-byte signature, then walk
    * length-tagged chunks to IEND, recomputing each chunk's CRC32.
    * Returns None on any STRUCTURAL violation (bad signature, chunk
    * overrunning the buffer, missing IHDR/IEND); a structurally sound
    * file whose checksums fail parses with `crcOk = false` — the
    * quarantine verdict, distinct from "not a PNG". The cursor is a
    * Long for the same reason as [[parseWav]]: a hostile 2³¹-adjacent
    * length must not wrap the bounds check. */
  def parsePng(b: Array[Byte]): Option[PngInfo] = {
    if (b.length < 8 + 25 + 12) return None // sig + IHDR chunk + IEND
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return None; i += 1 }
    var off = 8L
    var ihdr: Option[(Int, Int, Int, Int)] = None
    var nChunks = 0
    var idatBytes = 0L
    var crcOk = true
    var sawEnd = false
    val crc = new java.util.zip.CRC32()
    while (!sawEnd) {
      if (off + 12 > b.length) return None // truncated chunk header
      val o = off.toInt
      val len = be32(b, o)
      if (len < 0 || off + 12 + len > b.length) return None
      val typ = tag(b, o + 4)
      crc.reset()
      crc.update(b, o + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, o + 8 + len)) crcOk = false
      nChunks += 1
      typ match {
        case "IHDR" if len >= 13 =>
          ihdr = Some((be32(b, o + 8), be32(b, o + 12),
            b(o + 16) & 0xff, b(o + 17) & 0xff))
        case "IDAT" => idatBytes += len
        case "IEND" => sawEnd = true
        case _ => ()
      }
      off += 12L + len
    }
    // trailing garbage after IEND is a structural violation too
    if (off != b.length) return None
    for ((w, h, bd, ct) <- ihdr if w > 0 && h > 0)
      yield PngInfo(w, h, bd, ct, nChunks, idatBytes.toInt, crcOk)
  }

  /** Decode the pixel bytes of a parsed 8-bit GRAYSCALE PNG: inflate
    * the concatenated IDAT zlib stream (java.util.zip.Inflater — zlib
    * is a public spec, not a codec) and strip the per-scanline filter
    * byte, accepting only filter 0 (None) — the only filter
    * [[buildPngGray8]] emits. Returns None if inflation fails, a
    * scanline uses an unsupported filter, or the pixel count is
    * short. Callers gate on `info.crcOk` FIRST: decoding bytes that
    * failed their checksum is exactly what the CRC exists to stop. */
  def pngGray(b: Array[Byte], info: PngInfo): Option[Array[Byte]] = {
    if (info.bitDepth != 8 || info.colorType != 0) return None
    // gather the zlib stream across all IDAT chunks (second walk —
    // structure already validated by parsePng)
    val z = new Array[Byte](info.idatBytes)
    var off = 8L
    var zo = 0
    while (off + 12 <= b.length) {
      val o = off.toInt
      val len = be32(b, o)
      if (tag(b, o + 4) == "IDAT") {
        System.arraycopy(b, o + 8, z, zo, len); zo += len
      }
      off += 12L + len
    }
    // Hostile-input guard: a CRC-correct IHDR can still declare huge
    // dimensions (e.g. 65536x65536) whose (1+w)*h overflows Int to a
    // negative size — reject rather than throw/OOM. The raw buffer
    // also cannot legitimately need more bytes than ~1032x the IDAT
    // payload (zlib's max expansion), so bound it by that too.
    val rawLen = (1L + info.width) * info.height
    if (rawLen <= 0 || rawLen > Int.MaxValue - 8 ||
        rawLen > 8L + 1032L * info.idatBytes) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    try {
      var done = 0
      while (done < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, done, raw.length - done)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        done += n
      }
      if (done != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val px = new Array[Byte](info.width * info.height)
    var r = 0
    while (r < info.height) {
      if (raw(r * (1 + info.width)) != 0) return None // only filter None
      System.arraycopy(raw, r * (1 + info.width) + 1, px,
        r * info.width, info.width)
      r += 1
    }
    Some(px)
  }

  /** Bytes-per-IDAT-chunk when the writer splits the zlib stream —
    * small enough that multi-IDAT reassembly is exercised by every
    * realistic payload. */
  val PngIdatChunk = 8192

  /** Deflate STORED-block size cap (RFC 1951 stored LEN is 16-bit). */
  private val StoredMax = 65535

  /** REAL 8-bit grayscale PNG writer — the ENCODE half of
    * [[parsePng]]/[[pngGray]], same round-trip role as [[buildWav8]]:
    * signature, IHDR, the zlib stream (handwritten RFC-1950 framing
    * over RFC-1951 STORED blocks — deterministic byte-for-byte, no
    * Deflater heuristics) split across IDAT chunks of
    * [[PngIdatChunk]] bytes, and IEND; every chunk carries its real
    * CRC32. `pixels` fills rows left-to-right top-to-bottom; the last
    * row zero-pads. */
  def buildPngGray8(width: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && pixels.nonEmpty, "PNG needs pixels")
    val height = (pixels.length + width - 1) / width
    // raw scanlines: filter byte 0 + width pixels per row
    val raw = new Array[Byte]((1 + width) * height)
    var r = 0
    while (r < height) {
      val n = math.min(width, pixels.length - r * width)
      System.arraycopy(pixels, r * width, raw, r * (1 + width) + 1, n)
      r += 1
    }
    // zlib: 0x78 0x01 header, stored deflate blocks, big-endian adler32
    val nBlocks = (raw.length + StoredMax - 1) / StoredMax
    val z = java.nio.ByteBuffer.allocate(2 + 5 * nBlocks + raw.length + 4)
    z.put(0x78.toByte).put(0x01.toByte)
    var done = 0
    while (done < raw.length) {
      val n = math.min(StoredMax, raw.length - done)
      val last = done + n == raw.length
      z.put(if (last) 1.toByte else 0.toByte) // BFINAL | BTYPE=00 (stored)
        .put((n & 0xff).toByte).put(((n >> 8) & 0xff).toByte)
        .put(((~n) & 0xff).toByte).put((((~n) >> 8) & 0xff).toByte)
        .put(raw, done, n)
      done += n
    }
    val adler = new java.util.zip.Adler32()
    adler.update(raw)
    z.putInt(adler.getValue.toInt)
    val zlib = z.array()

    def chunk(typ: String, data: Array[Byte], from: Int, len: Int)
        (bb: java.nio.ByteBuffer): Unit = {
      bb.putInt(len)
        .put(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        .put(data, from, len)
      val c = new java.util.zip.CRC32()
      c.update(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      c.update(data, from, len)
      bb.putInt(c.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
      .array()
    val nIdat = (zlib.length + PngIdatChunk - 1) / PngIdatChunk
    val out = java.nio.ByteBuffer.allocate(
      8 + (12 + 13) + nIdat * 12 + zlib.length + 12)
    out.put(PngSig)
    chunk("IHDR", ihdr, 0, 13)(out)
    var zi = 0
    while (zi < zlib.length) {
      val n = math.min(PngIdatChunk, zlib.length - zi)
      chunk("IDAT", zlib, zi, n)(out)
      zi += n
    }
    chunk("IEND", Array.emptyByteArray, 0, 0)(out)
    out.array()
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
