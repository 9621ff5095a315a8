package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata (brief: first-class training-data pipeline
  * surface).
  *
  * The Spark-side plumbing is real — schema, per-partition batch
  * iteration (the JVM analogue of `mapInPandas` batches), fixed-width
  * tensor/embedding outputs, deterministic frame sampling. The codec
  * itself is STUBBED (this container has no image/audio libraries):
  * [[StubCodec.decode]] produces a deterministic fake tensor from the
  * payload bytes, so every downstream operator (resize, pooling,
  * embedding, frame sampling) is exercised with stable, testable
  * values. Swapping in a real codec changes ONLY StubCodec.
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

  /** STUB CODEC — deterministic fake decode.
    * Real deployment: replace with an actual image/audio decoder
    * (e.g. javax.imageio / ffmpeg bindings); signatures stay fixed.
    */
  object StubCodec {
    /** ??? real decode — faked as a seeded byte-mix over the payload:
      * returns `channels * width * height` floats in [0, 1). `seed`
      * varies the fake content (e.g. per video frame) without copying
      * the payload. */
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

  /** Nearest-neighbor resize of a decoded HxWxC tensor — real
    * arithmetic over the (fake) tensor. */
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

  /** decode → resize(8×8) → mean-pool(dim): per-partition batch loop,
    * no shuffle, fixed-width output. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val decoded = StubCodec.decode(m.payload, m.meta)
        val resized = resize(decoded, m.meta, 8, 8)
        MediaFeature(m.media_id, m.kind,
          pool(resized, dim))
      }
    }
  }

  /** Deterministic frame sampling for video payloads: k evenly-spaced
    * frame indices, each decoded+pooled independently. */
  def sampleFrames(media: Dataset[MediaRecord], k: Int,
      dim: Int = 16): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, m.meta.nFrames)
      (0 until math.min(k, n)).map { j =>
        val idx = j * n / math.min(k, n)
        // frame-seeded decode: full frame index as the seed (no byte
        // wraparound collisions, no payload copy per frame)
        val decoded = StubCodec.decode(m.payload, m.meta, seed = idx.toLong)
        FrameSample(m.media_id, idx, pool(decoded, dim))
      }
    }
  }

  /** Fixture media table derived from `documents`: payload = utf-8
    * bytes of the text (an opaque blob as far as the operators are
    * concerned), kind cycling by doc_id, plausible typed metadata. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(16).as("width"), lit(12).as("height"), lit(3).as("channels"),
        lit(16000).as("sampleRate"),
        (col("doc_id") % 7 + 2).cast("int").as("nFrames")).as("meta"))
      .as[MediaRecord]
  }
}
