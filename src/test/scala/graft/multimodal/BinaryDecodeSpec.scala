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
}
