package graft.multimodal

import graft.SparkSpec
import graft.Tables

/** Drives the multimodal decode plumbing on the real documents table. */
class BinaryDecodeSpec extends SparkSpec {

  test("decodeDocuments: frame counts and feature shape") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val frames = BinaryDecode.decodeDocuments(spark, docs, partitions = 4)
    val sample = frames.filter(_.doc_id == 0).collect().sortBy(_.frame_no)

    val nChars = docs.filter("doc_id = 0").head().getAs[Long]("n_chars")
    val expectedFrames = math.ceil(nChars.toDouble / BinaryDecode.FrameBytes).toInt
    assert(sample.length === expectedFrames)
    // all frames but the last are full
    assert(sample.init.forall(_.n_bytes === BinaryDecode.FrameBytes))
    assert(sample.forall(_.features.length === BinaryDecode.FeatureDim))
    // histogram mass equals byte count (the stub codec's invariant)
    sample.foreach(f => assert(f.features.sum === f.n_bytes.toDouble))
  }

  test("decode is deterministic across partitionings") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    val a = BinaryDecode.decodeDocuments(spark, docs, partitions = 1)
      .collect().map(f => (f.doc_id, f.frame_no, f.features.toSeq)).sortBy(x => (x._1, x._2))
    val b = BinaryDecode.decodeDocuments(spark, docs, partitions = 7)
      .collect().map(f => (f.doc_id, f.frame_no, f.features.toSeq)).sortBy(x => (x._1, x._2))
    assert(a.toSeq === b.toSeq)
  }

  test("mapPartitions resize matches q84's column-level replay byte for byte") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val records = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.lit("image/png").as("mime"),
      org.apache.spark.sql.functions.col("text")
        .cast("binary").as("payload")).as[BinaryDecode.MediaRecord]
    val resized = BinaryDecode.resizeAll(records, 64)
      .collect().map(r => r.doc_id ->
        java.security.MessageDigest.getInstance("MD5").digest(r.payload)
          .map("%02x".format(_)).mkString).toMap
    val q84 = graft.SparkEntry.queries("q84_resize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(resized.size === q84.size)
    assert(resized === q84,
      "the stub scaler and the SQL nearest-neighbor replay must agree")
    // contract: every resized payload is exactly the target size
    assert(BinaryDecode.resizeAll(records, 64).collect()
      .forall(_.payload.length === 64))
  }

  // ---- real-container path: hand-built RIFF/WAV and BMP fixtures ----

  /** Builds a real, canonical 44-byte-header PCM WAV file:
    * 16-bit signed LE mono samples. */
  private def buildWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Builds a real minimal 24-bit BMP (BITMAPINFOHEADER, bottom-up). */
  private def buildBmp(width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4 // rows pad to 4-byte boundary
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

  test("parseWav: hand-built real PCM file round-trips header and frame energy") {
    // 512 samples: 256 of silence then 256 of a full-scale square wave
    val samples = Array.tabulate[Short](512)(i =>
      if (i < 256) 0 else if (i % 2 == 0) 1000 else -1000)
    val wav = buildWav(samples, 8000)
    val info = BinaryDecode.parseWav(wav)
    assert(info.isDefined, "canonical WAV must parse")
    val w = info.get
    assert(w.audioFormat === 1 && w.numChannels === 1
      && w.sampleRate === 8000 && w.bitsPerSample === 16)
    assert(w.dataOffset === 44 && w.dataBytes === 1024)
    // per-256-sample frame energy: silent frame = 0, loud frame = 256·1000²
    val e = BinaryDecode.wavFrameEnergies(wav, w, 256)
    assert(e.toSeq === Seq(0L, 256L * 1000 * 1000))
    // 8-bit PCM path: unsigned bytes centered at 128
    val wav8 = {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(8000)
        .putShort(1).putShort(8)
      bb.put("data".getBytes("US-ASCII")).putInt(4)
      bb.put(128.toByte).put(255.toByte).put(0.toByte).put(128.toByte)
      bb.array()
    }
    val w8 = BinaryDecode.parseWav(wav8).get
    assert(w8.bitsPerSample === 8)
    // samples decode to 0, 127, −128, 0 → one frame of 127² + 128²
    assert(BinaryDecode.wavFrameEnergies(wav8, w8, 4).toSeq ===
      Seq(127L * 127 + 128L * 128))
  }

  test("parseWav: malformed inputs return None, never throw") {
    val good = buildWav(Array.tabulate[Short](16)(_.toShort), 44100)
    assert(BinaryDecode.parseWav(good).isDefined)
    assert(BinaryDecode.parseWav(Array.empty[Byte]).isEmpty)
    assert(BinaryDecode.parseWav("RIFFxxxxWAVE".getBytes).isEmpty)
    // flip the WAVE tag
    val bad = good.clone(); bad(8) = 'X'.toByte
    assert(BinaryDecode.parseWav(bad).isEmpty)
    // truncate into the data chunk: declared size exceeds payload
    assert(BinaryDecode.parseWav(good.take(50)).isEmpty)
    // a chunk size that overflows the buffer must be rejected
    val lying = good.clone()
    lying(40) = 0x7f.toByte; lying(41) = 0x7f.toByte
    lying(42) = 0x7f.toByte; lying(43) = 0x7f.toByte
    assert(BinaryDecode.parseWav(lying).isEmpty)
    // a chunk size near 2^31 would wrap `off + 8 + sz` computed in
    // Int arithmetic (0x7ffffff0 + 44 < 0), sneaking the bounds check
    // — the guard must do its arithmetic in Long
    val wrapping = good.clone()
    wrapping(40) = 0xf0.toByte; wrapping(41) = 0xff.toByte
    wrapping(42) = 0xff.toByte; wrapping(43) = 0x7f.toByte
    assert(BinaryDecode.parseWav(wrapping).isEmpty)
    // same trap on a NON-data chunk: the walk must not wrap `off`
    // negative and keep walking (the data chunk sits first here, so
    // the loop continues past the hostile fmt-like chunk)
    val hostile = {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("junk".getBytes("US-ASCII")).putInt(0x7ffffff0)
      bb.array()
    }
    assert(BinaryDecode.parseWav(hostile).isEmpty)
  }

  test("parseBmp: hand-built real 24-bit BMP parses; malformed rejected") {
    val bmp = buildBmp(7, 5) // odd width exercises row padding
    val info = BinaryDecode.parseBmp(bmp)
    assert(info.isDefined)
    assert(info.get.width === 7 && info.get.height === 5
      && info.get.bitsPerPixel === 24 && info.get.pixelOffset === 54)
    assert(BinaryDecode.parseBmp("not a bmp at all - padding padding padding padding padding".getBytes).isEmpty)
    assert(BinaryDecode.parseBmp(bmp.take(40)).isEmpty)
  }

  // ---- real PNG container: checksum-validated chunk walk ----

  test("buildPngGray8/parsePng/pngGray: pixel-exact round-trip incl. multi-IDAT") {
    // small image: 2 scanlines, last row padded
    val px = Array.tabulate[Byte](11)(i => (i * 23 + 1).toByte)
    val png = BinaryDecode.buildPngGray8(7, px)
    val info = BinaryDecode.parsePng(png).getOrElse(fail("must parse"))
    assert(info.width === 7 && info.height === 2
      && info.bitDepth === 8 && info.colorType === 0)
    assert(info.crcOk, "writer must emit valid CRCs")
    assert(info.nChunks === 3) // IHDR + 1 IDAT + IEND
    val out = BinaryDecode.pngGray(png, info).getOrElse(fail("must decode"))
    assert(out.length === 14)
    assert(out.take(11).toSeq === px.toSeq)
    assert(out.drop(11).forall(_ === 0), "last row zero-pads")

    // large image: zlib stream spans multiple IDAT chunks AND multiple
    // stored deflate blocks (raw > 65535) — reassembly must be exact
    val big = Array.tabulate[Byte](300 * 300)(i => (i * 131 + 7).toByte)
    val png2 = BinaryDecode.buildPngGray8(300, big)
    val info2 = BinaryDecode.parsePng(png2).getOrElse(fail("big must parse"))
    assert(info2.crcOk && info2.width === 300 && info2.height === 300)
    assert(info2.nChunks > 3, "stream must span several IDAT chunks")
    val out2 = BinaryDecode.pngGray(png2, info2).getOrElse(fail("big must decode"))
    assert(java.util.Arrays.equals(out2, big))
  }

  test("parsePng: CRC32 catches tampering; structural violations return None") {
    val png = BinaryDecode.buildPngGray8(16,
      Array.tabulate[Byte](64)(_.toByte))
    // flip one byte INSIDE the first IDAT's data: structure intact,
    // checksum must fail — the quarantine verdict, not a parse error
    val tampered = png.clone()
    tampered(43) = (tampered(43) ^ 0x5a).toByte
    val ti = BinaryDecode.parsePng(tampered)
    assert(ti.isDefined, "tampered file is still structurally a PNG")
    assert(!ti.get.crcOk, "CRC32 must catch the flipped byte")
    assert(BinaryDecode.parsePng(png).get.crcOk)

    assert(BinaryDecode.parsePng(Array.empty[Byte]).isEmpty)
    assert(BinaryDecode.parsePng("definitely not a png, just text padding".getBytes).isEmpty)
    // bad signature byte
    val badSig = png.clone(); badSig(0) = 0x42.toByte
    assert(BinaryDecode.parsePng(badSig).isEmpty)
    // truncation mid-chunk
    assert(BinaryDecode.parsePng(png.take(png.length - 5)).isEmpty)
    // trailing garbage after IEND
    assert(BinaryDecode.parsePng(png ++ Array[Byte](1, 2, 3)).isEmpty)
    // hostile chunk length near 2^31: Int arithmetic would wrap the
    // bounds check negative — the Long cursor must reject it
    val hostile = png.clone()
    hostile(33) = 0x7f.toByte; hostile(34) = 0xff.toByte
    hostile(35) = 0xff.toByte; hostile(36) = 0xf0.toByte
    assert(BinaryDecode.parsePng(hostile).isEmpty)
  }

  test("probeContainers dispatches real WAV/BMP from opaque payloads in one pass") {
    import spark.implicits._
    val opaqueBytes =
      "just some opaque bytes, long enough to span two stub frames".getBytes
    val recs = Seq(
      BinaryDecode.MediaRecord(1L, "audio/wav",
        buildWav(Array.tabulate[Short](1000)(i => (i % 100).toShort), 16000)),
      BinaryDecode.MediaRecord(2L, "image/bmp", buildBmp(32, 8)),
      BinaryDecode.MediaRecord(3L, "text/plain", opaqueBytes)
    ).toDS()
    val probes = BinaryDecode.probeContainers(recs, frameSamples = 256)
      .collect().map(p => p.doc_id -> p).toMap
    assert(probes(1L).container === "wav" && probes(1L).sample_rate === 16000
      && probes(1L).channels === 1 && probes(1L).bits === 16
      && probes(1L).n_frames === 4) // ceil(1000/256)
    assert(probes(2L).container === "bmp" && probes(2L).width === 32
      && probes(2L).height === 8 && probes(2L).bits === 24)
    assert(probes(3L).container === "opaque"
      && probes(3L).n_frames ===
        (opaqueBytes.length + BinaryDecode.FrameBytes - 1) / BinaryDecode.FrameBytes)
  }
}
