package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary plumbing: encode → partition-parallel decode → typed metadata") {
    val d = Seq((1L, "abcdef"), (2L, "xy")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.asBinary(d, "doc_id", "text"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 6 && meta(1L).format == "png")    // 6 % 3 == 0
    assert(meta(2L).n_bytes == 2 && meta(2L).format == "webp")   // 2 % 3 == 2
    assert(meta(1L).width == 16 + 6 % 64 && meta(1L).frames == 1 + 6 % 4)
  }

  test("resize fits within bounds preserving aspect; features are deterministic fixed-dim") {
    val d = Seq((1L, "a" * 100)).toDF("doc_id", "text") // 100 bytes
    val bin = Multimodal.asBinary(d, "doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, bin) // width 16+100%64=52, height 16+100%48=20
    val resized = Multimodal.resizeMeta(spark, meta, maxW = 26, maxH = 26).collect().head
    assert(resized.width == 26 && resized.height == 10) // scale 0.5, aspect kept

    val f1 = Multimodal.extractFeatures(spark, bin).collect().head.getSeq[Float](1)
    val f2 = Multimodal.extractFeatures(spark, bin).collect().head.getSeq[Float](1)
    assert(f1.length == 8 && f1 == f2 && f1.forall(x => x >= 0f && x < 1f))
  }

  test("frame sampling emits every k-th frame index") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text") // 3 bytes → frames = 1 + 3%4 = 4
    val meta = Multimodal.decodeMeta(spark, Multimodal.asBinary(d, "doc_id", "text"))
    val frames = Multimodal.sampleFrames(spark, meta, everyK = 2)
      .as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 2)))
  }
}
