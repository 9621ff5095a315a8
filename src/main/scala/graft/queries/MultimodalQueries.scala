package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal operator surface as driver-contract queries. The codecs
  * are real and pure-JDK (imageio PNG/BMP, AudioSystem WAV, PNG-frame
  * video containers — graft.multimodal.Multimodal); features come from
  * actual decoded pixels/samples. No DuckDB oracle is expressible
  * (decode is not SQL), so these stay rows>0 checks with the decode
  * contract pinned by MultimodalSpec's pixel-exact golden tests.
  */
object MultimodalQueries {

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
    })
}
