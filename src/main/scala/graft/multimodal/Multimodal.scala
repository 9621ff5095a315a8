package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata (brief: first-class training-data pipeline
  * surface).
  *
  * The codecs are REAL and pure-JDK — no new dependencies:
  *   - images: `javax.imageio` (PNG and BMP are both encoded in the
  *     fixture and sniffed+decoded format-agnostically);
  *   - audio: RIFF/WAVE PCM-16 mono, parsed via
  *     `javax.sound.sampled.AudioSystem`;
  *   - video: a length-prefixed container of per-frame PNG payloads
  *     ([[VideoCodec]]), each frame an independent `imageio` decode.
  * [[StubCodec]] survives only as the documented fallback for payload
  * formats the JDK cannot decode (e.g. JPEG2000, MP4) — it produces a
  * deterministic fake tensor so the pipeline degrades gracefully
  * instead of failing on exotic blobs.
  *
  * Scale notes: payloads never shuffle — decode/featurize run in the
  * scan stage via `mapPartitions`; only fixed-width embeddings
  * (`array<float>`, ~256 B/row) flow into joins/aggregations. At
  * 100 TB the media table is stored with payloads in their own
  * parquet column (columnar pruning skips them unless decoded), and
  * embedding output feeds the similarity operators
  * ([[graft.queries.SimilarityQueries]]).
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, channels: Int,
      sampleRate: Int, nFrames: Int)

  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeature(
      media_id: Long, kind: String, embedding: Array[Float])

  final case class FrameSample(
      media_id: Long, frame_index: Int, frame_embedding: Array[Float])

  /** Image encode/decode on `javax.imageio`. Decode is format-agnostic
    * (ImageIO sniffs PNG/BMP/JPEG/GIF from the payload bytes); both
    * PNG and BMP round-trip RGB losslessly, so decoded pixel values
    * are exact.
    */
  object ImageCodec {
    // ImageIO's default stream cache backs every read/write with a
    // disk temp file — 32 decode threads then serialize on temp-file
    // create/delete, not on pixels (measured: parallel featurize
    // SLOWER than single-threaded until this). In-memory payloads
    // never need the disk spool; object init runs once per JVM, so
    // every executor that touches a codec gets the setting.
    javax.imageio.ImageIO.setUseCache(false)

    /** Encode row-major packed-RGB ints (0xRRGGBB) to `format`
      * ("png" | "bmp") bytes. */
    def encode(rgb: Array[Int], w: Int, h: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, rgb, 0, w)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, format, bos)
      bos.toByteArray
    }

    /** Decode any ImageIO-supported payload to
      * `(width, height, row-major HxWxC floats in [0,1])`, C=3 (RGB).
      * None when the payload is not a decodable image.
      */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
      try {
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val argb = img.getRGB(0, 0, w, h, null, 0, w)
          val out = new Array[Float](w * h * 3)
          var i = 0
          while (i < argb.length) {
            val p = argb(i)
            out(3 * i) = ((p >>> 16) & 0xFF) / 255f
            out(3 * i + 1) = ((p >>> 8) & 0xFF) / 255f
            out(3 * i + 2) = (p & 0xFF) / 255f
            i += 1
          }
          Some((w, h, out))
        }
      } catch { case _: java.io.IOException => None }
  }

  /** RIFF/WAVE PCM-16 mono. Encode writes the canonical 44-byte
    * header by hand (deterministic bytes); decode goes through
    * `javax.sound.sampled.AudioSystem` so any WAV variant the JDK
    * understands (either endianness) is accepted.
    */
  object WavCodec {
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1).putShort(1) // PCM, mono
      bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      bb.putShort(2).putShort(16) // block align, bits/sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Decode to `(sampleRate, samples in [-1,1))`. None when the
      * payload is not audio the JDK can parse. */
    def decode(payload: Array[Byte]): Option[(Int, Array[Float])] =
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val n = bytes.length / 2
          val out = new Array[Float](n)
          var i = 0
          while (i < n) {
            val (b0, b1) = (bytes(2 * i).toInt, bytes(2 * i + 1).toInt)
            val s =
              if (fmt.isBigEndian) ((b0 << 8) | (b1 & 0xFF)).toShort
              else ((b1 << 8) | (b0 & 0xFF)).toShort
            out(i) = s / 32768f
            i += 1
          }
          Some((fmt.getSampleRate.toInt, out))
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Video as a length-prefixed container of independently-decodable
    * PNG frames: `magic, nFrames, (len_i, pngBytes_i)*` — so frame k
    * is reachable by header skips without decoding frames 0..k-1.
    */
  object VideoCodec {
    val Magic = 0x47564944 // "GVID"

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val total = 8 + frames.map(4 + _.length).sum
      val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(Magic).putInt(frames.length)
      frames.foreach(f => bb.putInt(f.length).put(f))
      bb.array()
    }

    def frameCount(payload: Array[Byte]): Option[Int] = {
      if (payload.length < 8) return None
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
      if (bb.getInt() != Magic) None else Some(bb.getInt())
    }

    /** Raw encoded bytes of frame `idx` — header skips only, no pixel
      * decode (the seek path shared by [[decodeFrame]] and
      * [[Multimodal.upscaledVideo]]). None when the container is
      * malformed OR truncated mid-frame: a declared frame count is a
      * claim, not a guarantee (partial upload/download), and a seek
      * past the real bytes must degrade to "frame unavailable", never
      * throw into the enclosing Spark stage. */
    def frameBytes(payload: Array[Byte], idx: Int): Option[Array[Byte]] =
      try {
        val bb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
        if (payload.length < 8 || bb.getInt() != Magic) return None
        val n = bb.getInt()
        if (idx < 0 || idx >= n) return None
        var i = 0
        while (i < idx) {
          val skip = bb.getInt() // read len BEFORE taking the post-read position
          bb.position(bb.position() + skip)
          i += 1
        }
        val len = bb.getInt()
        if (len < 0 || len > bb.remaining()) return None
        val frame = new Array[Byte](len)
        bb.get(frame)
        Some(frame)
      } catch {
        // position past limit / length past remaining on a truncated
        // container — same verdict as a bad magic: no such frame
        case _: java.nio.BufferUnderflowException => None
        case _: IllegalArgumentException => None
      }

    /** Seek to frame `idx` and ImageIO-decode it. */
    def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Float])] =
      frameBytes(payload, idx).flatMap(ImageCodec.decode)
  }

  /** FALLBACK CODEC — deterministic fake decode for payload formats
    * the JDK cannot handle (real features come from [[ImageCodec]] /
    * [[WavCodec]] / [[VideoCodec]] above). Returns
    * `channels * width * height` floats in [0, 1) from a seeded
    * byte-mix over the payload.
    */
  object StubCodec {
    def decode(payload: Array[Byte], meta: MediaMeta,
        seed: Long = 0L): Array[Float] = {
      val n = math.max(1, meta.channels * meta.width * meta.height)
      val out = new Array[Float](n)
      var h = 1125899906842597L ^ (seed * 0x9E3779B97F4A7C15L)
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      i = 0
      while (i < n) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 40) & 0xFFFFFF).toFloat / (1 << 24)
        i += 1
      }
      out
    }
  }

  /** Nearest-neighbor resize of a decoded HxWxC tensor. */
  def resize(pixels: Array[Float], meta: MediaMeta,
      newW: Int, newH: Int): Array[Float] = {
    val out = new Array[Float](meta.channels * newW * newH)
    var y = 0
    while (y < newH) {
      val sy = y * meta.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * meta.width / newW
        var c = 0
        while (c < meta.channels) {
          out((y * newW + x) * meta.channels + c) =
            pixels((sy * meta.width + sx) * meta.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mean-pool a tensor into a fixed-dim embedding (the feature-extract
    * stage; output feeds the ANN/similarity operators). */
  def pool(pixels: Array[Float], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val chunk = math.max(1, pixels.length / dim)
    var d = 0
    while (d < dim) {
      var s = 0.0f
      var i = d * chunk
      val end = math.min(pixels.length, i + chunk)
      val n = math.max(1, end - i)
      while (i < end) { s += pixels(i); i += 1 }
      out(d) = s / n
      d += 1
    }
    out
  }

  /** 64-bit perceptual average-hash of an image payload: decode →
    * nearest-neighbor 8×8 → grayscale → threshold against the mean.
    * Invariant to the container format (PNG/BMP round-trip the same
    * pixels) and to nearest-neighbor integer rescale (the 8×8 sample
    * grid lands on the same source pixels), and stable under global
    * brightness shifts (mean-relative bits) — the cheap blocking key
    * for image dedup, the visual analogue of [[graft.queries
    * .DedupQueries]]' SimHash. None when the payload isn't an image.
    */
  def aHash64(payload: Array[Byte]): Option[Long] =
    ImageCodec.decode(payload).map { case (w, h, px) => aHashPixels(w, h, px) }

  /** [[aHash64]]'s core over an already-decoded RGB tensor — shared
    * with the per-frame hashing of [[videoFp64]], where the frame is
    * decoded once by the container seek and re-encoding it just to
    * re-decode would double the codec work. */
  private def aHashPixels(w: Int, h: Int, px: Array[Float]): Long = {
    val small = resize(px, MediaMeta(w, h, 3, 0, 1), 8, 8)
    val gray = Array.tabulate(64)(i =>
      small(3 * i) + small(3 * i + 1) + small(3 * i + 2))
    val mean = gray.sum / 64f
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (gray(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** 64-bit ORDER-SENSITIVE video fingerprint: each frame's perceptual
    * average-hash, folded in frame order with an FNV-style mix — so a
    * re-encoded video collapses onto its original exactly when every
    * frame is perceptually identical AND in the same order (a
    * bag-of-frame-hashes would conflate a video with its reverse; the
    * order sensitivity is spec-pinned). Inherits [[aHash64]]'s
    * invariances per frame: container re-encode, nearest-neighbor
    * integer upscale (the 8×8 grid lands on the same source pixels —
    * nested floor division: ⌊⌊2yh/8⌋/2⌋ = ⌊yh/8⌋), global brightness
    * shift. None when the payload is not a GVID container; frames
    * that fail image decode hash as 0 rather than poisoning the clip.
    * The per-frame seek is O(k) header skips — quadratic in frames
    * per payload, fine for clip-sized containers (the fixture's ≤8;
    * a long-video path would thread one cursor). */
  def videoFp64(payload: Array[Byte]): Option[Long] =
    VideoCodec.frameCount(payload).map { n =>
      var acc = 1125899906842597L
      var i = 0
      while (i < n) {
        val fh = VideoCodec.decodeFrame(payload, i)
          .map { case (w, h, px) => aHashPixels(w, h, px) }
          .getOrElse(0L)
        acc = (acc ^ fh) * 0x100000001B3L
        i += 1
      }
      acc
    }

  /** Nearest-neighbor upscaled PNG re-encode: a payload with
    * different bytes, dimensions, and possibly container than the
    * input, but the same perceptual content — the controlled
    * "re-hosted thumbnail" shape image dedup must catch. Non-image
    * payloads pass through unchanged. */
  def upscaled(m: MediaRecord, factor: Int): MediaRecord =
    upscaledPng(m.payload, factor).map { case (uw, uh, bytes) =>
      m.copy(payload = bytes, meta = MediaMeta(uw, uh, 3, 0, 1))
    }.getOrElse(m)

  /** Decode → nearest-neighbor upscale → lossless PNG re-encode of a
    * single image payload; the pixel path shared by [[upscaled]] and
    * [[upscaledVideo]]. None when the payload isn't a decodable image. */
  private def upscaledPng(payload: Array[Byte],
      factor: Int): Option[(Int, Int, Array[Byte])] =
    ImageCodec.decode(payload).map { case (w, h, px) =>
      val (uw, uh) = (w * factor, h * factor)
      val up = resize(px, MediaMeta(w, h, 3, 0, 1), uw, uh)
      val rgb = Array.tabulate(uw * uh) { i =>
        def ch(c: Int) =
          math.max(0, math.min(255, math.round(up(3 * i + c) * 255f)))
        (ch(0) << 16) | (ch(1) << 8) | ch(2)
      }
      (uw, uh, ImageCodec.encode(rgb, uw, uh, "png"))
    }

  /** Per-frame upscaled re-encode of a GVID container: every frame's
    * bytes, and the clip's total byte length, change; the perceptual
    * content and frame order do not — the controlled "re-rendered at a
    * higher resolution" shape video dedup must catch (the video
    * analogue of [[upscaled]] / [[attenuated]]). Non-video payloads
    * pass through unchanged. */
  def upscaledVideo(m: MediaRecord, factor: Int): MediaRecord =
    VideoCodec.frameCount(m.payload).map { n =>
      val raw = (0 until n).map(i => VideoCodec.frameBytes(m.payload, i))
      // a truncated container (declared frames missing) passes through
      // unchanged, like any other payload the transform can't parse
      if (raw.exists(_.isEmpty)) m
      else m.copy(
        payload = VideoCodec.encode(raw.map(f =>
          upscaledPng(f.get, factor).map(_._3).getOrElse(f.get))),
        meta = MediaMeta(m.meta.width * factor, m.meta.height * factor,
          3, 0, n))
    }.getOrElse(m)

  /** 32-bit amplitude-invariant audio fingerprint: the decoded
    * waveform is cut into 33 equal windows and bit b is the sign of
    * the energy DELTA between windows b and b+1 — the core trick of
    * the Chromaprint/Shazam family (minus the FFT, which the energy
    * profile stands in for at fingerprint-blocking fidelity). A
    * global volume change multiplies every window energy by the same
    * factor, so the comparisons — hence the fingerprint — are
    * invariant up to QUANTIZATION of the rescaled payload (the audio
    * analogue of aHash64's mean-relative bits): a real re-master
    * truncates each 16-bit sample, so two windows whose energies are
    * nearly tied can flip their comparison bit — exact invariance
    * holds only where window energies are well-separated (the
    * fixture's attenuated() pair is asserted equal empirically, not
    * by construction; near-dup matching tolerates stray flipped bits
    * via its Hamming radius); any time-structure change flips bits. None when the payload is
    * not JDK-parseable audio; clips shorter than 33 samples
    * fingerprint as 0 (all-equal empty energies). */
  def audioFp32(payload: Array[Byte]): Option[Long] =
    WavCodec.decode(payload).map { case (_, samples) =>
      val w = 33
      val energies = Array.tabulate(w) { i =>
        val lo = (samples.length.toLong * i / w).toInt
        val hi = (samples.length.toLong * (i + 1) / w).toInt
        var e = 0.0; var j = lo
        while (j < hi) { e += samples(j).toDouble * samples(j); j += 1 }
        e
      }
      (0 until 32).foldLeft(0L)((acc, b) =>
        if (energies(b) > energies(b + 1)) acc | (1L << b) else acc)
    }

  /** Volume-attenuated WAV re-encode: different bytes, same temporal
    * structure — the controlled "re-mastered level" shape audio dedup
    * must catch (the audio analogue of [[upscaled]]). Scaling happens
    * on the recovered 16-bit samples, so the twin is a deterministic
    * function of the original payload. Non-audio payloads pass
    * through unchanged. */
  def attenuated(m: MediaRecord, den: Int): MediaRecord =
    WavCodec.decode(m.payload).map { case (sr, samples) =>
      val shorts = samples.map(f =>
        (math.round(f * 32768f) / den).toShort)
      m.copy(payload = WavCodec.encode(shorts, sr))
    }.getOrElse(m)

  /** Per-record embedding from REAL decoded content: images and video
    * key-frames decode via imageio then resize(8x8)+pool; audio
    * decodes via AudioSystem then pools the waveform directly. The
    * stub path fires only when no JDK codec recognizes the payload.
    */
  private def embed(m: MediaRecord, dim: Int): Array[Float] = {
    val decoded: Option[Array[Float]] = m.kind match {
      case "image" =>
        ImageCodec.decode(m.payload).map { case (w, h, px) =>
          resize(px, MediaMeta(w, h, 3, 0, 0), 8, 8)
        }
      case "audio" =>
        WavCodec.decode(m.payload).map(_._2)
      case "video" =>
        VideoCodec.decodeFrame(m.payload, 0).map { case (w, h, px) =>
          resize(px, MediaMeta(w, h, 3, 0, 0), 8, 8)
        }
      case _ => None
    }
    pool(decoded.getOrElse(
      resize(StubCodec.decode(m.payload, m.meta), m.meta, 8, 8)), dim)
  }

  /** decode → resize(8×8) → mean-pool(dim): per-partition batch loop,
    * no shuffle, fixed-width output. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map(m => MediaFeature(m.media_id, m.kind, embed(m, dim)))
    }
  }

  /** Deterministic frame sampling for video payloads: k evenly-spaced
    * frame indices, each an independent PNG decode out of the frame
    * container, pooled to a fixed-dim embedding. */
  def sampleFrames(media: Dataset[MediaRecord], k: Int,
      dim: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = VideoCodec.frameCount(m.payload)
        .getOrElse(math.max(1, m.meta.nFrames))
      (0 until math.min(k, n)).map { j =>
        val idx = j * n / math.min(k, n)
        val px = VideoCodec.decodeFrame(m.payload, idx)
          .map { case (w, h, p) => resize(p, MediaMeta(w, h, 3, 0, 0), 8, 8) }
          .getOrElse(StubCodec.decode(m.payload, m.meta, seed = idx.toLong))
        FrameSample(m.media_id, idx, pool(px, dim))
      }
    }
  }

  /** splitmix64-style deterministic pixel/sample synthesis for the
    * fixture payloads (content is a pure function of (id, frame, i)). */
  private def mix(seed: Long, frame: Int, i: Int): Long = {
    var z = seed * 0x9E3779B97F4A7C15L + frame * 0xBF58476D1CE4E5B9L +
      i * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[multimodal] def synthPixels(id: Long, frame: Int, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => (mix(id, frame, i) & 0xFFFFFF).toInt)

  private[multimodal] def synthSamples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (mix(id, -1, i) & 0xFFFF).toShort)

  /** Fixture media table derived from `documents`: REAL encoded
    * payloads — PNG or BMP images (alternating, to exercise format
    * sniffing), PCM-16 WAV audio, and PNG-frame video containers —
    * with deterministic synthesized content keyed by doc_id. Encoding
    * happens per-partition AFTER spreading the ids across the full
    * core count: the fixture parquet is one row group → one scan
    * partition, which would serialize every codec downstream (decode
    * parallelism always follows its input partitioning — measured
    * 4.2 s → sub-second on mm_frame_sample). Only the 8-byte ids
    * shuffle; payloads are born, decoded, and dropped inside one
    * partition, exactly the shape a pre-partitioned media lake
    * serves at scale.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
      it.map { id =>
        (id % 3) match {
          case 0 =>
            val (w, h) = (16, 12)
            val fmt = if ((id / 3) % 2 == 0) "png" else "bmp"
            MediaRecord(id, "image",
              ImageCodec.encode(synthPixels(id, 0, w, h), w, h, fmt),
              MediaMeta(w, h, 3, 0, 1))
          case 1 =>
            val (sr, n) = (16000, 512)
            MediaRecord(id, "audio", WavCodec.encode(synthSamples(id, n), sr),
              MediaMeta(0, 0, 1, sr, 1))
          case _ =>
            val nF = (id % 7 + 2).toInt
            val (w, h) = (8, 6)
            val frames = (0 until nF).map(f =>
              ImageCodec.encode(synthPixels(id, f, w, h), w, h, "png"))
            MediaRecord(id, "video", VideoCodec.encode(frames),
              MediaMeta(w, h, 3, 0, nF))
        }
      }
    }
  }
}
