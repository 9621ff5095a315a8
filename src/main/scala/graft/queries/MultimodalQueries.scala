package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal operator surface as driver-contract queries. The codecs
  * are real and pure-JDK (imageio PNG/BMP, AudioSystem WAV, PNG-frame
  * video containers — graft.multimodal.Multimodal); features come from
  * actual decoded pixels/samples. Decode is not SQL, so mm_featurize /
  * mm_frame_sample stay rows>0 checks with the decode contract pinned
  * by MultimodalSpec's pixel-exact golden tests; mm_image_neardup's
  * dedup logic downstream of the hash IS relational, so its oracle
  * replays from the [[dumpAux]] hash snapshot (decode+hash is the
  * trust boundary, like the EMBL parse behind the gfe_build oracles).
  */
object MultimodalQueries {

  /** (media_id, ahash) over the image corpus + planted re-encoded
    * twins — the scan-stage decode/hash shared by mm_image_neardup
    * and its aux snapshot. */
  private[queries] def imageHashes(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val media = Multimodal.fromDocuments(s, docs)
      .filter(_.kind == "image")
    val twins = Multimodal
      .fromDocuments(s, docs.where(col("doc_id") % 30 === 0))
      .filter(_.kind == "image")
      .map(m => Multimodal.upscaled(m, 2)
        .copy(media_id = m.media_id + 1000000L))
    media.union(twins)
      .mapPartitions(_.flatMap(m =>
        Multimodal.aHash64(m.payload).map(h => (m.media_id, h))))
      .toDF("media_id", "ahash")
  }

  /** Aux snapshot of the decoded-image hash table for the
    * mm_image_neardup oracle. Called by [[graft.Verify]]. */
  def dumpAux(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    imageHashes(s, d)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${GfeQueries.auxDir}/mm_ahash")

  val all: Seq[QueryDef] = Seq(

    // decode → resize → pool over a binary payload column; output is
    // the fixed-width embedding that feeds the similarity operators.
    QueryDef.noOracle("mm_featurize") { (s, d) =>
      Multimodal.featurize(
        Multimodal.fromDocuments(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("kind"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e0"))
        .orderBy("media_id")
    },

    // deterministic frame sampling over video payloads.
    QueryDef.noOracle("mm_frame_sample") { (s, d) =>
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
    })
}
