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
}
