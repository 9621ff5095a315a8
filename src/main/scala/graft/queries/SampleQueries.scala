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

    // Temperature resampling (the mixture-flattening pass of an LLM
    // data pipeline): keep a doc of stratum ℓ with probability
    // sqrt(n_min/n_ℓ) — expected kept counts sqrt(n_ℓ·n_min), i.e.
    // temperature τ=2 between proportional and uniform. The accept
    // test is exact integer cross-multiplication on a 20-bit content
    // hash (u < sqrt(n_min/n_ℓ) ⇔ h²·n_ℓ < n_min·2^40), so both
    // engines decide identically — no float pow/sqrt, no RNG. Scale
    // shape: the stratum histogram is a tiny map-side-combined agg
    // broadcast back; the accept test is scan-local.
    QueryDef(
      "smp_temperature",
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |mn AS (SELECT min(n) AS n_min FROM cnt)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cnt USING (lang) CROSS JOIN mn
        |WHERE (CAST(('0x' || substr(md5(d.text),1,15)) AS BIGINT) >> 40)
        |      * (CAST(('0x' || substr(md5(d.text),1,15)) AS BIGINT) >> 40)
        |      * cnt.n < mn.n_min * (1::BIGINT << 40)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.hex60
      val docs = Tables.documents(s, d)
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val mn = cnt.agg(min(col("n")).as("n_min"))
      val h20 = shiftright(hex60(col("text")), 40)
      docs.join(broadcast(cnt), "lang").crossJoin(broadcast(mn))
        .where(h20 * h20 * col("n") < col("n_min") * lit(1L << 40))
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
