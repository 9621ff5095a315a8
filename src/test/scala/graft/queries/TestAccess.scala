package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Test bridge into `private[queries]` sketch internals, so specs in
  * package `graft` can drive the register fold directly. */
object SketchTestAccess {
  def hllRegisters(df: DataFrame): DataFrame =
    SketchQueries.hllRegisters(df, "event_type", col("user_id"))
  def hllEstimate(regs: DataFrame): DataFrame =
    SketchQueries.hllEstimate(regs, "event_type")
  def cmsCounters(docs: DataFrame): DataFrame =
    SketchQueries.cmsCounters(docs)
  def cmsProbeTopk(counters: DataFrame, docs: DataFrame): DataFrame =
    SketchQueries.cmsProbeTopk(counters, docs)
}

/** Test bridge into `private[queries]` similarity internals. */
object SimilarityTestAccess {
  def vecs(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    SimilarityQueries.vecs(s, d)
  def kmeansIndex(s: org.apache.spark.sql.SparkSession, d: String): (DataFrame, DataFrame) =
    SimilarityQueries.kmeansIndex(s, d)
  def assignToCells(batch: DataFrame, centroids: DataFrame): DataFrame =
    SimilarityQueries.assignToCells(batch, centroids)
}

/** Test bridge into `private[queries]` dedup internals. */
object DedupTestAccess {
  def simhash(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    DedupQueries.simhashDF(s, d)
  def shingleStorage(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    DedupQueries.positional(s, d)
}
