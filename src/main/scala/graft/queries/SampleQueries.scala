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

    // Deterministic train/valid/test split — the assignment every
    // training pipeline needs to be STABLE across re-ingests and
    // engine versions: bucket = 60-bit content hash mod 100, split by
    // fixed thresholds (90/5/5). Content-keyed (not id-keyed) so a
    // re-crawled duplicate lands in the same split as its original
    // and can never leak train→test; scan-local map with no shuffle
    // beyond the presentation sort, so it composes with any upstream
    // filter at 100 TB.
    QueryDef(
      "smp_split_assign",
      """SELECT doc_id, CAST(b AS BIGINT) AS bucket,
        |       CASE WHEN b < 90 THEN 'train'
        |            WHEN b < 95 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        CAST(('0x' || substr(md5(text),1,15)) AS BIGINT) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.hex60
      Tables.documents(s, d)
        .select(col("doc_id"), (hex60(col("text")) % 100).as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

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
    // test compares a 20-bit content hash against a PER-STRATUM integer
    // threshold thr_ℓ = floor(sqrt(n_min/n_ℓ)·2^20) computed once in
    // the tiny stratum aggregate — the per-row test never multiplies by
    // n_ℓ, so nothing overflows however large a stratum grows (the
    // earlier h²·n_ℓ < n_min·2^40 form wrapped signed 64-bit past ~2^23
    // docs per stratum: Spark wraps silently, DuckDB raises — engines
    // diverge). sqrt/division/floor are correctly-rounded IEEE double
    // ops fed identical BIGINTs, so both engines derive the identical
    // threshold; the per-row compare is integer-exact. Scale shape: the
    // stratum histogram is a tiny map-side-combined agg broadcast back;
    // the accept test is scan-local.
    QueryDef(
      "smp_temperature",
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |mn AS (SELECT min(n) AS n_min FROM cnt),
        |thr AS (SELECT lang,
        |               CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n) * (1::BIGINT << 20)) AS BIGINT) AS thr
        |        FROM cnt CROSS JOIN mn)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN thr USING (lang)
        |WHERE (CAST(('0x' || substr(md5(d.text),1,15)) AS BIGINT) >> 40) < thr.thr
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.hex60
      val docs = Tables.documents(s, d)
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val mn = cnt.agg(min(col("n")).as("n_min"))
      val thr = cnt.crossJoin(mn).select(
        col("lang"),
        floor(sqrt(col("n_min").cast("double") / col("n")) * lit(1L << 20)).as("thr"))
      val h20 = shiftright(hex60(col("text")), 40)
      docs.join(broadcast(thr), "lang")
        .where(h20 < col("thr"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Domain-mixture epoch expansion (the data-mixing pass that turns
    // per-domain weights into a physical training epoch): upsample
    // each language toward the largest one, w = min(3, n_max/n_ℓ),
    // materialized as ⌊w⌋ copies per doc plus one more iff a 20-bit
    // content hash clears the fractional part. All-integer ppm
    // arithmetic (floor-div weights, hash·10^6 < frac·2^20 accept
    // test) so both engines derive identical copy counts — no float,
    // no RNG; on the test corpus the strata exercise all three
    // branches (cap, exact floor, fractional accept). Scale shape:
    // the weight table is a tiny broadcast agg; the expansion is a
    // scan-local explode whose output size is exactly Σ n_copies — no
    // shuffle before the presentation sort, so it composes with any
    // upstream filter at 100 TB.
    QueryDef(
      "smp_mixture_resample",
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |mx AS (SELECT max(n) AS n_max FROM cnt),
        |w AS (SELECT lang,
        |             least(3000000, (n_max * 1000000) // n) AS w_ppm
        |      FROM cnt CROSS JOIN mx),
        |base AS (SELECT d.doc_id, d.lang,
        |  w.w_ppm // 1000000
        |  + CASE WHEN (CAST(('0x' || substr(md5(d.text),1,15)) AS BIGINT) >> 40)
        |             * 1000000 < ((w.w_ppm % 1000000) << 20)
        |         THEN 1 ELSE 0 END AS n_copies
        |  FROM documents d JOIN w USING (lang))
        |SELECT doc_id, lang,
        |       CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
        |FROM base
        |ORDER BY doc_id, copy_idx""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.hex60
      val docs = Tables.documents(s, d)
      val cnt = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val mx = cnt.agg(max(col("n")).as("n_max"))
      val w = cnt.crossJoin(mx).select(
        col("lang"),
        least(lit(3000000L), expr("(n_max * 1000000) div n")).as("w_ppm"))
      val h20 = shiftright(hex60(col("text")), 40)
      docs.join(broadcast(w), "lang")
        .select(col("doc_id"), col("lang"),
          (expr("w_ppm div 1000000") +
            when(h20 * lit(1000000L) < shiftleft(col("w_ppm") % 1000000L, 20),
              1L).otherwise(0L)).as("n_copies"))
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
        .orderBy("doc_id", "copy_idx")
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
    },

    // Weighted priority sampling (Duffield/Alon priority sampling,
    // the deterministic analog of Efraimidis–Spirakis A-ES): each doc
    // draws priority = u/w with u a 20-bit content hash and w its
    // size in chars, and the global bottom-32 by priority form the
    // sample — longer docs get proportionally smaller priorities, so
    // inclusion probability ≈ size-proportional. This is how a
    // pipeline samples by TOKENS rather than documents (a quality
    // audit over "1% of the corpus by volume"). All-integer: priority
    // = (h20 · 10^6) div chars, identical `div`//`//` floor on both
    // engines. Scale shape: the priority is scan-local; the bottom-k
    // is a TakeOrdered (per-partition top-32 heap, never a global
    // sort); the final rank window runs over 32 rows.
    QueryDef(
      "smp_weighted_priority",
      """SELECT doc_id, n_chars, pri, rk FROM (
        |  SELECT doc_id, n_chars, pri,
        |         CAST(row_number() OVER (ORDER BY pri, doc_id) AS INT) AS rk
        |  FROM (SELECT doc_id, n_chars,
        |          ((CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) >> 40)
        |             * 1000000) // greatest(n_chars, 1) AS pri
        |        FROM documents))
        |WHERE rk <= 32 ORDER BY rk""".stripMargin) { (s, d) =>
      import graft.functions.GraftFunctions.hex60
      val pri = expr("(h20 * 1000000) div greatest(n_chars, 1)")
      val top = Tables.documents(s, d)
        .withColumn("h20", shiftright(hex60(col("text")), 40))
        .withColumn("pri", pri)
        .select("doc_id", "n_chars", "pri")
        .orderBy(col("pri"), col("doc_id"))
        .limit(32)
      top.withColumn("rk",
        row_number().over(Window.orderBy(col("pri"), col("doc_id"))).cast("int"))
        .orderBy("rk")
    })
}
