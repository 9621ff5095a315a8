package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  val meta = MediaMeta(width = 4, height = 3, channels = 2,
    sampleRate = 16000, nFrames = 5)

  // --- real codecs (pure JDK) ---

  test("PNG round-trip: decoded floats are the exact encoded pixels") {
    val rgb = Array(0xFF0000, 0x0080FF) // (255,0,0), (0,128,255) as 2x1
    val png = Multimodal.ImageCodec.encode(rgb, 2, 1, "png")
    // PNG magic: 0x89 'P' 'N' 'G'
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P')
    val Some((w, h, px)) = Multimodal.ImageCodec.decode(png)
    assert(w == 2 && h == 1)
    assert(px.toSeq == Seq(1f, 0f, 0f, 0f, 128 / 255f, 1f))
  }

  test("BMP round-trip: format sniffed, pixels exact") {
    val rgb = Array(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val bmp = Multimodal.ImageCodec.encode(rgb, 2, 2, "bmp")
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    val Some((w, h, px)) = Multimodal.ImageCodec.decode(bmp)
    assert(w == 2 && h == 2)
    assert(px.toSeq == rgb.flatMap(p => Seq(
      ((p >> 16) & 0xFF) / 255f, ((p >> 8) & 0xFF) / 255f, (p & 0xFF) / 255f)).toSeq)
  }

  test("WAV round-trip: AudioSystem parse, PCM-16 quantization exact") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 123)
    val wav = Multimodal.WavCodec.encode(samples, 16000)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val Some((sr, out)) = Multimodal.WavCodec.decode(wav)
    assert(sr == 16000)
    assert(out.toSeq == samples.map(_ / 32768f).toSeq)
  }

  test("video container: frame seek decodes the right PNG") {
    val f0 = Multimodal.ImageCodec.encode(Array(0xFF0000), 1, 1, "png")
    val f1 = Multimodal.ImageCodec.encode(Array(0x00FF00), 1, 1, "png")
    val f2 = Multimodal.ImageCodec.encode(Array(0x0000FF), 1, 1, "png")
    val vid = Multimodal.VideoCodec.encode(Seq(f0, f1, f2))
    assert(Multimodal.VideoCodec.frameCount(vid).contains(3))
    val Some((_, _, px1)) = Multimodal.VideoCodec.decodeFrame(vid, 1)
    assert(px1.toSeq == Seq(0f, 1f, 0f))
    val Some((_, _, px2)) = Multimodal.VideoCodec.decodeFrame(vid, 2)
    assert(px2.toSeq == Seq(0f, 0f, 1f))
    assert(Multimodal.VideoCodec.decodeFrame(vid, 3).isEmpty)
    assert(Multimodal.VideoCodec.frameCount("not a video".getBytes).isEmpty)
  }

  test("stub decode (fallback) is deterministic and payload-sensitive") {
    val a = Multimodal.StubCodec.decode("abc".getBytes, meta)
    val b = Multimodal.StubCodec.decode("abc".getBytes, meta)
    val c = Multimodal.StubCodec.decode("abd".getBytes, meta)
    assert(a.length == 4 * 3 * 2)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.forall(v => v >= 0f && v < 1f))
  }

  // --- tensor stages ---

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

  // --- end-to-end: features come from actual decoded content ---

  test("featurize computes from real decoded pixels (known uniform image)") {
    import spark.implicits._
    // uniform (100,150,200) 8x8 PNG: resize is identity, every pooled
    // chunk is one pixel's (r,g,b) -> every dim = mean(100,150,200)/255
    val png = Multimodal.ImageCodec.encode(Array.fill(64)(0x6496C8), 8, 8, "png")
    val rec = MediaRecord(7L, "image", png, MediaMeta(8, 8, 3, 0, 1))
    val Array(feat) = Multimodal.featurize(
      spark.createDataset(Seq(rec)), dim = 64).collect()
    val expected = (100 / 255f + 150 / 255f + 200 / 255f) / 3
    assert(feat.embedding.length == 64)
    feat.embedding.foreach(v => assert(math.abs(v - expected) < 1e-6))
  }

  test("featurize computes from real decoded audio (constant waveform)") {
    import spark.implicits._
    val wav = Multimodal.WavCodec.encode(Array.fill[Short](512)(16384), 8000)
    val rec = MediaRecord(8L, "audio", wav, MediaMeta(0, 0, 1, 8000, 1))
    val Array(feat) = Multimodal.featurize(
      spark.createDataset(Seq(rec)), dim = 64).collect()
    feat.embedding.foreach(v => assert(v == 0.5f))
  }

  test("featurize falls back to stub on undecodable payloads") {
    import spark.implicits._
    val rec = MediaRecord(9L, "image", "definitely not an image".getBytes,
      MediaMeta(4, 3, 3, 0, 1))
    val Array(feat) = Multimodal.featurize(
      spark.createDataset(Seq(rec)), dim = 16).collect()
    assert(feat.embedding.length == 16) // degraded, not crashed
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

  test("fixture payloads are real PNG/BMP/WAV/GVID bytes") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.fromDocuments(spark, docs).collect()
    val byKind = media.groupBy(_.kind)
    assert(byKind("image").exists(m => (m.payload(0) & 0xFF) == 0x89)) // PNG
    assert(byKind("image").exists(m => m.payload(0) == 'B' && m.payload(1) == 'M'))
    byKind("audio").foreach(m =>
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF"))
    byKind("video").foreach(m =>
      assert(Multimodal.VideoCodec.frameCount(m.payload).contains(m.meta.nFrames)))
    // every image decodes to its declared dimensions
    byKind("image").foreach { m =>
      val Some((w, h, _)) = Multimodal.ImageCodec.decode(m.payload)
      assert(w == m.meta.width && h == m.meta.height)
    }
  }

  test("frame sampling: k evenly spaced frames per video, real per-frame decode") {
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
      // distinct frames carry distinct decoded content
      assert(fs.map(_.frame_embedding.toSeq).distinct.length == fs.length)
    }
    // sampled-frame embedding equals a direct decode+pool of that frame
    val v = videos.head
    val direct = Multimodal.VideoCodec.decodeFrame(v.payload, 0)
      .map { case (w, h, px) =>
        Multimodal.pool(Multimodal.resize(px, MediaMeta(w, h, 3, 0, 0), 8, 8), 16)
      }.get
    val sampled = perVideo(v.media_id).find(_.frame_index == 0).get
    assert(sampled.frame_embedding.toSeq == direct.toSeq)
  }

  test("aHash64: invariant to container, nn-rescale, brightness; content-sensitive") {
    // gradient image: unambiguous bit pattern, no clipping at ±16
    val (w, h) = (16, 12)
    val grad = Array.tabulate(w * h) { i =>
      val v = 32 + (i * 160) / (w * h)
      (v << 16) | (v << 8) | v
    }
    val png = Multimodal.ImageCodec.encode(grad, w, h, "png")
    val bmp = Multimodal.ImageCodec.encode(grad, w, h, "bmp")
    val hp = Multimodal.aHash64(png).get
    assert(Multimodal.aHash64(bmp).get == hp, "format-invariant")
    val up = Multimodal.upscaled(
      MediaRecord(1L, "image", png, MediaMeta(w, h, 3, 0, 1)), 2)
    assert(up.meta.width == 2 * w && up.payload.length != png.length)
    assert(Multimodal.aHash64(up.payload).get == hp, "scale-invariant")
    val brighter = Multimodal.ImageCodec.encode(
      grad.map(p => p + 0x101010), w, h, "png")
    assert(Multimodal.aHash64(brighter).get == hp, "brightness-invariant")
    val other = Multimodal.ImageCodec.encode(
      grad.reverse, w, h, "png")
    assert(Multimodal.aHash64(other).get != hp, "content-sensitive")
    assert(Multimodal.aHash64("not an image".getBytes).isEmpty)
  }

  test("audioFp32: amplitude-invariant, content-sensitive") {
    val sr = 8000
    def clip(seed: Long) = Array.tabulate(4096) { i =>
      val x = (seed * 6364136223846793005L + i * 1442695040888963407L)
      ((x >>> 16) & 0xffff).toInt - 32768
    }.map(_.toShort)
    val samples = clip(7L)
    val wav = Multimodal.WavCodec.encode(samples, sr)
    val fp = Multimodal.audioFp32(wav).get
    // volume changes leave the energy-delta signs untouched
    Seq(2, 3, 5).foreach { den =>
      val quiet = Multimodal.WavCodec.encode(
        samples.map(v => (v / den).toShort), sr)
      assert(Multimodal.audioFp32(quiet).get == fp,
        s"1/$den attenuation must not move the fingerprint")
    }
    // a different clip fingerprints differently
    val other = Multimodal.WavCodec.encode(clip(8L), sr)
    assert(Multimodal.audioFp32(other).get != fp, "content-sensitive")
    // time-structure change flips bits even at equal total energy
    val reversed = Multimodal.WavCodec.encode(samples.reverse, sr)
    assert(Multimodal.audioFp32(reversed).get != fp,
      "temporal-structure-sensitive")
    assert(Multimodal.audioFp32("not audio".getBytes).isEmpty)
  }

  test("mm_audio_neardup recovers exactly the planted attenuated twins") {
    val d = "/root/testdata/sf0.001"
    val groups = SparkEntry.queries("mm_audio_neardup")(spark, d).collect()
    val expected = Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 30 == 1).sorted
    assert(groups.map(_.getLong(2)).toSeq == expected.toSeq,
      "every planted twin's original is a survivor")
    groups.foreach { r =>
      assert(r.getLong(1) == 2L, s"twin group of 2: $r")
      assert(r.getLong(3) == r.getLong(2) + 2000000L,
        s"dup is the planted attenuated re-encode: $r")
    }
  }

  test("videoFp64: invariant to per-frame upscale; order- and content-sensitive") {
    val (w, h) = (16, 12)
    def grad(shift: Int) = Array.tabulate(w * h) { i =>
      val v = 32 + ((i + shift) * 160) / (w * h) % 160
      (v << 16) | (v << 8) | v
    }
    def enc(frames: Seq[Array[Int]]) = Multimodal.VideoCodec.encode(
      frames.map(f => Multimodal.ImageCodec.encode(f, w, h, "png")))
    val frames = Seq(grad(0), grad(40), grad(80))
    val vid = enc(frames)
    val fp = Multimodal.videoFp64(vid).get
    // per-frame 2x upscale + PNG re-encode: new bytes, same fingerprint
    val up = Multimodal.upscaledVideo(
      MediaRecord(1L, "video", vid, MediaMeta(w, h, 3, 0, 3)), 2)
    assert(up.meta.width == 2 * w && up.payload.length != vid.length)
    assert(Multimodal.videoFp64(up.payload).get == fp, "upscale-invariant")
    // same frames, reversed order: different fingerprint
    assert(Multimodal.videoFp64(enc(frames.reverse)).get != fp,
      "frame-order-sensitive")
    // one frame swapped for different content: different fingerprint
    assert(Multimodal.videoFp64(enc(Seq(grad(0), grad(40), grad(120)))).get != fp,
      "content-sensitive")
    // a strict prefix of the clip: different fingerprint
    assert(Multimodal.videoFp64(enc(frames.take(2))).get != fp,
      "length-sensitive")
    assert(Multimodal.videoFp64("not a video".getBytes).isEmpty)
    // TRUNCATED container (valid header, frame bytes cut off): must
    // not throw — unreadable frames hash as 0, and the upscale twin
    // transform passes the clip through unchanged
    val truncated = vid.take(vid.length / 2)
    val tfp = Multimodal.videoFp64(truncated)
    assert(tfp.nonEmpty && tfp.get != fp,
      "truncated clip fingerprints (with 0-frames), never throws")
    val tm = Multimodal.upscaledVideo(
      MediaRecord(2L, "video", truncated, MediaMeta(w, h, 3, 0, 3)), 2)
    assert(tm.payload eq truncated, "truncated clip passes through unchanged")
  }

  test("mm_video_neardup recovers exactly the planted upscaled twins") {
    val d = "/root/testdata/sf0.001"
    val groups = SparkEntry.queries("mm_video_neardup")(spark, d).collect()
    val expected = Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 30 == 2).sorted
    assert(groups.map(_.getLong(2)).toSeq == expected.toSeq,
      "every planted twin's original is a survivor")
    groups.foreach { r =>
      assert(r.getLong(1) == 2L, s"twin group of 2: $r")
      assert(r.getLong(3) == r.getLong(2) + 3000000L,
        s"dup is the planted upscaled re-encode: $r")
    }
  }

  test("mm_image_neardup recovers exactly the planted upscaled twins") {
    val d = "/root/testdata/sf0.001"
    val groups = SparkEntry.queries("mm_image_neardup")(spark, d).collect()
    val expected = Tables.documents(spark, d)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 30 == 0 && id % 3 == 0).sorted
    assert(groups.map(_.getLong(2)).toSeq == expected.toSeq,
      "every planted twin's original is a survivor")
    groups.foreach { r =>
      assert(r.getLong(1) == 2L, s"twin group of 2: $r")
      assert(r.getLong(3) == r.getLong(2) + 1000000L,
        s"dup is the planted re-encode: $r")
    }
  }
}
