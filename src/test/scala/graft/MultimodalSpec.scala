package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val meta = MediaMeta(width = 4, height = 3, channels = 2,
    sampleRate = 16000, nFrames = 5)

  test("stub decode is deterministic and payload-sensitive") {
    val a = Multimodal.StubCodec.decode("abc".getBytes, meta)
    val b = Multimodal.StubCodec.decode("abc".getBytes, meta)
    val c = Multimodal.StubCodec.decode("abd".getBytes, meta)
    assert(a.length == 4 * 3 * 2)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.forall(v => v >= 0f && v < 1f))
  }

  test("nearest-neighbor resize preserves channel layout") {
    // 2x2x1 tensor -> 4x4 upscale: each source pixel becomes a 2x2 block
    val m = MediaMeta(2, 2, 1, 0, 0)
    val px = Array(1f, 2f, 3f, 4f) // row-major HxW
    val up = Multimodal.resize(px, m, 4, 4)
    assert(up.length == 16)
    assert(up.toSeq == Seq(
      1f, 1f, 2f, 2f,
      1f, 1f, 2f, 2f,
      3f, 3f, 4f, 4f,
      3f, 3f, 4f, 4f))
  }

  test("pool produces a fixed-dim mean embedding") {
    val e = Multimodal.pool(Array(1f, 3f, 5f, 7f), 2)
    assert(e.toSeq == Seq(2f, 6f))
    // ragged division still yields `dim` outputs
    assert(Multimodal.pool(Array.fill(7)(1f), 4).length == 4)
  }

  test("featurize: distributed decode->resize->pool, fixed width") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val feats = Multimodal.featurize(
      Multimodal.fromDocuments(spark, docs), dim = 64).collect()
    assert(feats.length == 500)
    assert(feats.forall(_.embedding.length == 64))
    // deterministic across runs
    val again = Multimodal.featurize(
      Multimodal.fromDocuments(spark, docs), dim = 64).collect()
    assert(feats.sortBy(_.media_id).map(_.embedding.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.embedding.toSeq).toSeq)
  }

  test("frame sampling: k evenly spaced frames per video, video-only") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.fromDocuments(spark, docs)
    val frames = Multimodal.sampleFrames(media, k = 3).collect()
    val videos = media.filter(_.kind == "video").collect()
    assert(videos.nonEmpty)
    val perVideo = frames.groupBy(_.media_id)
    assert(perVideo.keySet == videos.map(_.media_id).toSet)
    perVideo.values.foreach { fs =>
      assert(fs.length <= 3 && fs.nonEmpty)
      assert(fs.map(_.frame_index).distinct.length == fs.length)
    }
  }
}
