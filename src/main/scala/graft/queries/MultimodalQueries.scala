package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal operator surface as driver-contract queries. The codecs
  * are real and pure-JDK (imageio PNG/BMP, AudioSystem WAV, PNG-frame
  * video containers — graft.multimodal.Multimodal); features come from
  * actual decoded pixels/samples. Decode is not SQL, so the decode
  * stage sits behind trust boundaries (MultimodalSpec's pixel-exact
  * golden tests + aux snapshots, like the EMBL parse behind the
  * gfe_build oracles) while everything SQL-expressible is oracled:
  *   - mm_frame_sample needs NO aux at all — the fixture's frame
  *     count is a pure function of doc_id, so DuckDB re-derives the
  *     sampling rule from `documents` and any container mis-parse
  *     (frameCount, header skip) hash-mismatches;
  *   - mm_featurize snapshots the embedding head and re-derives
  *     kind / cardinality / dim in DuckDB (a dropped, duplicated, or
  *     kind-misclassified payload breaks the join or the row count);
  *   - mm_image_neardup replays the dedup groupBy from the hash
  *     snapshot.
  */
object MultimodalQueries {

  /** Shared plant/fingerprint scaffold of the three near-dup queries:
    * (media_id, `fpCol`) over the `kind` corpus, plus twins — docs
    * with doc_id % 30 == `residue` re-encoded by `twin` and planted
    * under media_id + `idOffset`. Decode and fingerprinting run in
    * the scan stage (mapPartitions); only (id, 8-byte fp) shuffles. */
  private def plantedFps(
      s: org.apache.spark.sql.SparkSession, d: String,
      kind: String, residue: Int, idOffset: Long,
      twin: Multimodal.MediaRecord => Multimodal.MediaRecord,
      fp: Array[Byte] => Option[Long], fpCol: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val media = Multimodal.fromDocuments(s, docs)
      .filter(_.kind == kind)
    val twins = Multimodal
      .fromDocuments(s, docs.where(col("doc_id") % 30 === residue))
      .filter(_.kind == kind)
      .map(m => twin(m).copy(media_id = m.media_id + idOffset))
    media.union(twins)
      .mapPartitions(_.flatMap(m => fp(m.payload).map(h => (m.media_id, h))))
      .toDF("media_id", fpCol)
  }

  /** (media_id, ahash) over the image corpus + planted re-encoded
    * twins — the scan-stage decode/hash shared by mm_image_neardup
    * and its aux snapshot. */
  private[queries] def imageHashes(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    plantedFps(s, d, "image", residue = 0, idOffset = 1000000L,
      Multimodal.upscaled(_, 2), Multimodal.aHash64, "ahash")

  /** (media_id, kind, dim, e0) — the featurize projection shared by
    * the mm_featurize query and its aux snapshot (same pure map, so
    * snapshot and query-time values are identical by construction). */
  private[queries] def featureRows(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    Multimodal.featurize(
      Multimodal.fromDocuments(s, Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("kind"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))

  /** (media_id, afp) over the audio corpus + planted volume-
    * attenuated twins — the scan-stage decode/fingerprint shared by
    * mm_audio_neardup and its aux snapshot (the audio mirror of
    * [[imageHashes]]). */
  private[queries] def audioFps(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    plantedFps(s, d, "audio", residue = 1, idOffset = 2000000L,
      Multimodal.attenuated(_, 2), Multimodal.audioFp32, "afp")

  /** (media_id, vfp) over the video corpus + planted per-frame-
    * upscaled twins — the scan-stage decode/fingerprint shared by
    * mm_video_neardup and its aux snapshot (the video mirror of
    * [[imageHashes]] / [[audioFps]]). */
  private[queries] def videoFps(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    plantedFps(s, d, "video", residue = 2, idOffset = 3000000L,
      Multimodal.upscaledVideo(_, 2), Multimodal.videoFp64, "vfp")

  /** Aux snapshots for the multimodal oracles: the decoded-image hash
    * table (mm_image_neardup), the audio fingerprint table
    * (mm_audio_neardup), the video fingerprint table
    * (mm_video_neardup), and the embedding head (mm_featurize).
    * Called by [[graft.Verify]]. */
  def dumpAux(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    imageHashes(s, d)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${GfeQueries.auxDir}/mm_ahash")
    audioFps(s, d)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${GfeQueries.auxDir}/mm_afp")
    videoFps(s, d)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${GfeQueries.auxDir}/mm_vfp")
    featureRows(s, d)
      .select(col("media_id"), col("dim"), col("e0"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${GfeQueries.auxDir}/mm_feat")
  }

  val all: Seq[QueryDef] = Seq(

    // decode → resize → pool over a binary payload column; output is
    // the fixed-width embedding that feeds the similarity operators.
    // Oracle: e0/dim from the [[dumpAux]] snapshot (decode+embed is
    // the trust boundary), but `kind` and the row SET are re-derived
    // independently from `documents` — the inner join plus the
    // dim=64 guard means a payload featurize dropped, duplicated, or
    // classified as the wrong media kind fails the row-count or hash
    // compare.
    QueryDef(
      "mm_featurize",
      s"""SELECT f.media_id, d.kind, f.dim, f.e0
        |FROM read_parquet('${GfeQueries.auxDir}/mm_feat/*.parquet') f
        |JOIN (SELECT CAST(doc_id AS BIGINT) AS media_id,
        |             CASE CAST(doc_id % 3 AS INT)
        |               WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |               ELSE 'video' END AS kind
        |      FROM documents) d USING (media_id)
        |WHERE f.dim = 64
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      featureRows(s, d).orderBy("media_id")
    },

    // Deterministic frame sampling over video payloads: k=3 evenly
    // spaced frames, each an independent seek+decode out of the
    // length-prefixed container. Fully oracled with NO aux snapshot:
    // the fixture's frame count is doc_id % 7 + 2, so DuckDB
    // re-derives the sampled indices j·n÷min(3,n) straight from
    // `documents` — the Spark side reads n by PARSING the binary
    // container, so a frameCount/seek bug diverges from the oracle.
    QueryDef(
      "mm_frame_sample",
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |       CAST(j * n // m AS BIGINT) AS frame_index,
        |       CAST(16 AS BIGINT) AS dim
        |FROM (SELECT doc_id, doc_id % 7 + 2 AS n,
        |             LEAST(3, doc_id % 7 + 2) AS m
        |      FROM documents WHERE doc_id % 3 = 2),
        |     range(3) r(j)
        |WHERE j < m
        |ORDER BY media_id, frame_index""".stripMargin) { (s, d) =>
      Multimodal.sampleFrames(
        Multimodal.fromDocuments(s, Tables.documents(s, d)), k = 3)
        .toDF()
        .select(col("media_id"), col("frame_index"),
          size(col("frame_embedding")).as("dim"))
        .orderBy("media_id", "frame_index")
    },

    // Perceptual image dedup via 64-bit average-hash over decoded
    // pixels: every 30th image is planted back as a 2× nearest-
    // neighbor PNG re-encode (different bytes, dimensions, container)
    // under media_id + 10^6, and the groupBy on aHash recovers
    // exactly those twins — the "re-hosted thumbnail" dedup a media
    // corpus needs. Decode and hashing run in the scan stage
    // (mapPartitions); only (media_id, 8-byte hash) ever shuffles.
    // MultimodalSpec pins format/scale/brightness invariance and the
    // exact twin recovery.
    QueryDef(
      "mm_image_neardup",
      s"""SELECT ahash, count(*) AS n_images,
        |       min(media_id) AS survivor_id, max(media_id) AS dup_id
        |FROM read_parquet('${GfeQueries.auxDir}/mm_ahash/*.parquet')
        |GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY survivor_id""".stripMargin) { (s, d) =>
      imageHashes(s, d)
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_images"),
          min("media_id").as("survivor_id"),
          max("media_id").as("dup_id"))
        .where(col("n_images") >= 2)
        .orderBy("survivor_id")
    },

    // Audio near-dup via the 32-bit energy-delta fingerprint: planted
    // volume-attenuated re-encodes (different bytes, same temporal
    // structure) must collapse onto their originals, exactly like the
    // image tier's upscaled twins. Oracle: the dedup groupBy replayed
    // from the [[dumpAux]] fingerprint snapshot (decode+fingerprint
    // is the trust boundary; the amplitude-invariance property itself
    // is pinned by MultimodalSpec against freshly scaled payloads).
    QueryDef(
      "mm_audio_neardup",
      s"""SELECT afp, count(*) AS n_clips,
        |       min(media_id) AS survivor_id, max(media_id) AS dup_id
        |FROM read_parquet('${GfeQueries.auxDir}/mm_afp/*.parquet')
        |GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY survivor_id""".stripMargin) { (s, d) =>
      audioFps(s, d)
        .groupBy("afp")
        .agg(count(lit(1)).as("n_clips"),
          min("media_id").as("survivor_id"),
          max("media_id").as("dup_id"))
        .where(col("n_clips") >= 2)
        .orderBy("survivor_id")
    },

    // Video near-dup via the order-sensitive folded frame-hash
    // fingerprint: every 10th video is planted back with all frames
    // 2×-upscaled and PNG re-encoded (different bytes per frame,
    // different container length) under media_id + 3·10^6, and the
    // groupBy on the fingerprint recovers exactly those twins —
    // completing the image/audio/video near-dup matrix. Oracle: the
    // dedup groupBy replayed from the [[dumpAux]] snapshot
    // (decode+fingerprint is the trust boundary; the per-frame
    // upscale invariance and the frame-ORDER sensitivity are pinned
    // by MultimodalSpec against freshly re-encoded payloads).
    QueryDef(
      "mm_video_neardup",
      s"""SELECT vfp, count(*) AS n_videos,
        |       min(media_id) AS survivor_id, max(media_id) AS dup_id
        |FROM read_parquet('${GfeQueries.auxDir}/mm_vfp/*.parquet')
        |GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY survivor_id""".stripMargin) { (s, d) =>
      videoFps(s, d)
        .groupBy("vfp")
        .agg(count(lit(1)).as("n_videos"),
          min("media_id").as("survivor_id"),
          max("media_id").as("dup_id"))
        .where(col("n_videos") >= 2)
        .orderBy("survivor_id")
    })
}
