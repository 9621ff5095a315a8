package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling — the training-pipeline ops that carve a
  * corpus down reproducibly (no RNG state, same result on any cluster
  * layout or retry):
  *
  *  - Hash-Bernoulli: keep a doc iff a content-hash prefix falls in
  *    the acceptance range. A pure scan-local filter — no shuffle, no
  *    seed bookkeeping, survives re-partitioning and incremental
  *    appends unchanged.
  *  - Stratified quota: fixed per-stratum quota by rank in content-
  *    hash order (a deterministic stand-in for "random K per
  *    language"). One shuffle on the stratum key; output bounded at
  *    quota × strata regardless of input size.
  *
  * Both use md5, which Spark and DuckDB spell identically, so the
  * samples are oracle-checked exactly.
  */
object SampleQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "smp_hash_sample",
      """SELECT doc_id, lang
        |FROM documents
        |WHERE substr(md5(text), 1, 1) IN ('0','1','2')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .where(substring(md5(col("text")), 1, 1).isin("0", "1", "2"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    QueryDef(
      "smp_stratified",
      """SELECT lang, doc_id, rn FROM (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang
        |                                 ORDER BY md5(text), doc_id) AS INT) AS rn
        |  FROM documents)
        |WHERE rn <= 20
        |ORDER BY lang, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy(md5(col("text")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 20)
        .select("lang", "doc_id", "rn")
        .orderBy("lang", "rn")
    })
}
