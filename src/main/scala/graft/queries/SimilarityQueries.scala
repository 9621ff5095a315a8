package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d).
  *
  * Two tiers, per the builder brief:
  *  - `v_cosine_topk` — brute-force cosine top-k: the exactness baseline.
  *    Queries are broadcast (tiny side), so the big side streams through
  *    a map + per-query top-k window; at 100 TB this is the "re-rank"
  *    stage, never the full-corpus scan.
  *  - `v_ann_ivf` — IVF cell-probe: corpus vectors are assigned to their
  *    nearest of K fixed centroids (one broadcast join + argmin), queries
  *    probe their P nearest cells, and exact scoring runs only inside
  *    probed cells. The cell assignment is the partitioning story: at
  *    scale the corpus is written bucketed by cell_id, so a probe touches
  *    P/K of the data.
  *
  * All dot products are built-in higher-order functions (`zip_with` +
  * `aggregate`) over DOUBLE — codegen'd, no UDFs. Similarities are
  * rounded to 4 decimals before any comparison/ranking so results are
  * bit-stable across engines (ties broken by vec_id).
  */
object SimilarityQueries {

  /** Native codegen'd dot product (graft.functions.DotProduct) — the
    * HOF form (`aggregate(zip_with(...))`) allocates an intermediate
    * array per pair, which dominates O(n²) similarity joins. */
  private[queries] def dot(a: Column, b: Column): Column =
    call_udf("graft_dot", a, b)

  /** embeddings as (vec_id, v: array<double>, nrm), materialized: the
    * corpus is referenced 2-4× per query (queries side, corpus side,
    * assign, re-rank) and Catalyst would otherwise recompute the cast +
    * norm per reference — at scale this is the stored, pre-normalized
    * vector table every ANN system keeps. Memoized per (session, dir)
    * with weak session keys — calling .cache() on a fresh DataFrame
    * per invocation would pin a new InMemoryRelation each call. */
  private val vecsCache = Memo.dfTable

  private[graft] def vecs(s: SparkSession, d: String): DataFrame =
    vecsCache(s, d) { vecProjection(Tables.embeddings(s, d)).cache() }

  /** (vec_id, v: array<double>, nrm) from a raw embeddings frame —
    * the normalization [[vecs]] memoizes for the corpus, also applied
    * per micro-batch by [[annMaintainFold]] (a batch's session may be
    * a foreachBatch clone, so registration follows the input). */
  private[queries] def vecProjection(df: DataFrame): DataFrame = {
    graft.functions.NativeFunctions.register(df.sparkSession)
    df.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  private val duckVecs =
    "SELECT vec_id, embedding::DOUBLE[] AS v, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings"

  private def aux(table: String): String =
    s"read_parquet('${GfeQueries.auxDir}/$table/*.parquet')"

  private val nQueries = 8 // query set: vec_id < 8
  private val topK = 10
  private val nCentroids = 16 // IVF: centroids = vec_id < 16
  private val nProbe = 4 // cells probed per query
  private val ivfK = 5 // neighbors returned per query

  /** Trained IVF index: k-means centroids (fixed seed) + cell
    * assignment, memoized per (session, dir) — the index is built once
    * and served to every probe, exactly like a stored IVF index file.
    * Returns (assign: vec_id → cell_id, centroids: c_id, cv, cnrm). */
  private val kmeansCache = Memo.dfPairTable

  private[graft] def kmeansIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    kmeansCache(s, d) {
      locally {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        // Spherical k-means: fit on UNIT vectors, where squared L2 is
        // 2−2·cos — Euclidean cells become cosine cells, matching the
        // cosine ground truth the probe serves. Training on raw
        // vectors puts cosine-near/norm-far pairs in different cells
        // and recall drops (0.625 vs 0.95 measured at sf0.01).
        val e = vecs(s, d)
        val feats = e.select(col("vec_id"),
          array_to_vector(transform(col("v"), x => x / col("nrm")))
            .as("features"))
        val model = new KMeans()
          .setK(nCentroids).setSeed(42L).setMaxIter(10)
          .fit(feats)
        val assign = model.transform(feats)
          .select(col("vec_id"), col("prediction").as("cell_id"))
          .cache()
        val cents = model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (i, c.toArray)
        }
        val centroids = s.createDataFrame(cents.toSeq)
          .toDF("c_id", "cv")
          .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
          .cache()
        (assign, centroids)
      }
    }

  /** IVF serve-path oracle: `asgCte` supplies a CTE chain (after `e`
    * and `cents`) ending in `fasg(vec_id, cell_id)` — the trained
    * assignment for v_ann_kmeans, standing ∪ nearest-centroid-added
    * for v_ann_incremental. Everything downstream (probe ranking,
    * candidates, exact re-rank, top-k) is shared text. */
  private def ivfServeSql(asgCte: String): String =
    s"""WITH e AS ($duckVecs),
       |cents AS (SELECT c_id, list(cj ORDER BY j) AS cv
       |          FROM ${aux("ann_centroids")} GROUP BY 1),
       |$asgCte,
       |q AS (SELECT * FROM e WHERE vec_id < $nQueries),
       |probe AS (
       |  SELECT q.vec_id AS q_id, c.c_id,
       |         round(sqrt(list_dot_product(c.cv, c.cv))
       |                 * sqrt(list_dot_product(c.cv, c.cv))
       |               - 2 * list_dot_product(q.v, c.cv) / q.nrm, 6)
       |           AS cdist
       |  FROM q CROSS JOIN cents c),
       |pr AS (SELECT q_id, c_id AS cell_id FROM (
       |  SELECT q_id, c_id,
       |         row_number() OVER (PARTITION BY q_id
       |                            ORDER BY cdist ASC, c_id) AS rn
       |  FROM probe) WHERE rn <= $nProbe),
       |cand AS (SELECT pr.q_id, a.vec_id AS n_id
       |         FROM pr JOIN fasg a ON a.cell_id = pr.cell_id
       |         WHERE a.vec_id <> pr.q_id),
       |${rerankSql("q_id", "n_id", ivfK)}""".stripMargin

  /** THE cross-engine re-rank contract, defined once for every
    * candidate-generating ANN query (IVF serve, PQ survivors, LSH
    * probe, kNN graph): exact cosine over the raw vectors, rounded to
    * 4 decimals BEFORE ranking, per-source top-k window with
    * neighbor-id tie-break, presentation order (src, nbr). SQL tail
    * appended after CTEs defining `e` and `cand($srcCol, $nbrCol)`. */
  private def rerankSql(srcCol: String, nbrCol: String, k: Int): String =
    s"""scored AS (
       |  SELECT c.$srcCol, c.$nbrCol,
       |         round(list_dot_product(se.v, ne.v) / (se.nrm * ne.nrm), 4)
       |           AS sim
       |  FROM cand c
       |  JOIN e se ON se.vec_id = c.$srcCol
       |  JOIN e ne ON ne.vec_id = c.$nbrCol)
       |SELECT $srcCol, $nbrCol, sim FROM (
       |  SELECT $srcCol, $nbrCol, sim,
       |         row_number() OVER (PARTITION BY $srcCol ORDER BY sim DESC, $nbrCol) AS rn
       |  FROM scored)
       |WHERE rn <= $k ORDER BY $srcCol, $nbrCol""".stripMargin

  /** Spark twin of [[rerankSql]]. `srcVecs` is the source-side vector
    * slice — wrap it in `broadcast()` at the call site when it is a
    * small query batch; the corpus side never broadcasts. */
  private def rerankTopK(cand: DataFrame, srcVecs: DataFrame,
      corpus: DataFrame, srcCol: String, nbrCol: String, k: Int): DataFrame =
    cand
      .join(srcVecs.select(col("vec_id").as(srcCol),
        col("v").as("sv"), col("nrm").as("snrm")), srcCol)
      .join(corpus.select(col("vec_id").as(nbrCol),
        col("v").as("nv"), col("nrm").as("nnrm")), nbrCol)
      .select(col(srcCol), col(nbrCol),
        round(dot(col("sv"), col("nv")) / (col("snrm") * col("nnrm")), 4)
          .as("sim"))
      .withColumn("rn", row_number().over(Window.partitionBy(srcCol)
        .orderBy(col("sim").desc, col(nbrCol))))
      .where(col("rn") <= k)
      .select(srcCol, nbrCol, "sim")
      .orderBy(srcCol, nbrCol)

  /** Rounded unit-space squared-L2 rank key to `centroids` (cols cv,
    * cnrm must be in scope via crossJoin). Probe with the SAME metric
    * k-means assigned with — squared L2 of the UNIT vector to the
    * centroid (|v̂|² is constant, so rank by |c|² − 2·v̂·c); 6-decimal
    * rounding makes the order bit-stable across engines. */
  private def centroidRank(v: Column, nrm: Column): Column =
    round(col("cnrm") * col("cnrm") - lit(2) * dot(v, col("cv")) / nrm, 6)

  /** Incremental ADD: nearest-centroid cell per batch vector — the
    * refit-free ingest step; scan-local (centroids broadcast). */
  private[graft] def assignToCells(
      batch: DataFrame, centroids: DataFrame): DataFrame =
    batch.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("c_id"),
        centroidRank(col("v"), col("nrm")).as("cdist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cdist").asc, col("c_id"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell_id"))

  /** IVF serve path against any (vec_id, cell_id) assignment: probe
    * nProbe cells per query, pull cell members as candidates, exact
    * cosine re-rank to ivfK. The trained index is the oracle's trust
    * boundary ([[dumpAux]] snapshot); this whole serve path replays
    * in DuckDB from raw vectors + the snapshot. */
  private def ivfServe(
      e: DataFrame, centroids: DataFrame, asg: DataFrame): DataFrame = {
    val q = e.where(col("vec_id") < nQueries)
    val probe = q.crossJoin(broadcast(centroids))
      .select(col("vec_id").as("q_id"), col("c_id"),
        centroidRank(col("v"), col("nrm")).as("cdist"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("q_id")
          .orderBy(col("cdist").asc, col("c_id"))))
      .where(col("rn") <= nProbe)
      .select(col("q_id"), col("c_id").as("cell_id"))
    val cand = broadcast(probe)
      .join(asg, "cell_id")
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
    rerankTopK(cand, broadcast(q), e, "q_id", "n_id", ivfK)
  }

  private val lshTables = 16 // hash tables (OR-amplification)
  private val lshBits = 6 // hyperplane bits per table (AND-amplification)
  private val knnK = 5 // neighbors per vertex in the kNN graph

  /** Shared oracle CTE chain ending in `bk(vec_id, t, bk)` — the
    * DuckDB replay of [[lshBuckets]] (v_lsh_topk, v_knn_graph). */
  private def lshIndexSql: String =
    s"""WITH e AS ($duckVecs),
      |ev AS (SELECT vec_id, d.j,
      |         CAST(round(v[d.j+1]*1000000) AS BIGINT) AS ix
      |       FROM e, (SELECT unnest(generate_series(0,63)) AS j) d),
      |pl AS (SELECT h.h, d.j,
      |         CASE ${DedupQueries.duckHex60(
           "('pl:' || CAST(h.h AS VARCHAR) || ':' || CAST(d.j AS VARCHAR))")} % 2
      |           WHEN 0 THEN CAST(1 AS BIGINT)
      |           ELSE CAST(-1 AS BIGINT) END AS sgn
      |       FROM (SELECT unnest(generate_series(0,${lshTables * lshBits - 1})) AS h) h,
      |            (SELECT unnest(generate_series(0,63)) AS j) d),
      |sums AS (SELECT ev.vec_id, pl.h, CAST(sum(pl.sgn*ev.ix) AS BIGINT) AS s
      |         FROM ev JOIN pl ON pl.j = ev.j GROUP BY 1, 2),
      |bk AS (SELECT vec_id, h // $lshBits AS t,
      |         CAST(sum(CASE WHEN s >= 0
      |           THEN CAST(1 AS BIGINT) << (h % $lshBits)
      |           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bk
      |       FROM sums GROUP BY 1, 2)""".stripMargin

  /** Random-hyperplane LSH bucket table (vec_id, t, bk) — the stored
    * index of [[lshCandidates]]. 96 deterministic hyperplanes (md5
    * PRF, the [[graft.graph.GraphAlgorithms.fastRpEmbedDF]] idiom)
    * with ±1 components; a vector's bit h is the sign of its signed
    * coordinate sum, and bits group into 16 tables × 6-bit bucket
    * keys. Everything is integer-exact (coordinates in micro-units,
    * ±1 planes, bit-packed keys), so the whole index replays
    * bit-for-bit in the DuckDB oracle — unlike the trained k-means /
    * PQ indexes there is NO trust-boundary snapshot.
    *
    * Scale shape: dims ride as rows (posexplode → broadcast join with
    * the 6144-row plane table → codegen'd hash agg), per the round-11
    * interpreted-HOF lesson; O(d·H) work per vector, one pass. At
    * 100 TB the output IS the index artifact, written bucketed by
    * (t, bk) next to the corpus. */
  private val lshBucketsCache = Memo.dfTable

  private[graft] def lshBuckets(s: SparkSession, d: String): DataFrame =
    lshBucketsCache(s, d) { buildLshBuckets(s, d).cache() }

  private def buildLshBuckets(s: SparkSession, d: String): DataFrame =
    lshBucketRows(s, vecs(s, d))

  /** [[buildLshBuckets]] over an arbitrary (vec_id, v, …) frame — the
    * per-micro-batch form [[lshMaintainFold]] applies (bucketing is a
    * pure per-row function of the vector, so the maintained index is
    * batch-partitioning-invariant). */
  private def lshBucketRows(s: SparkSession, e: DataFrame): DataFrame = {
    val ev = e.select(col("vec_id"), posexplode(col("v")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j"),
        round(col("x") * 1000000, 0).cast("long").as("ix"))
    // one flat range, no join: (h, j) = (id div 64, id mod 64) — keeps
    // even the tiny plane-table build out of nested-loop territory so
    // the whole query plans with equi-joins only (PlanQualitySpec)
    val planes = s.range(lshTables.toLong * lshBits * 64)
      .select(expr("id div 64").as("h"), expr("id % 64").as("j"))
      .select(col("h"), col("j"),
        when(pmod(call_udf("graft_hex60",
          concat(lit("pl:"), col("h").cast("string"), lit(":"),
            col("j").cast("string"))), lit(2)) === 0, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
    ev.join(broadcast(planes), "j")
      .groupBy(col("vec_id"), col("h"))
      .agg(sum(col("sgn") * col("ix")).as("s"))
      .select(col("vec_id"), expr(s"h div $lshBits").as("t"),
        when(col("s") >= 0,
          expr(s"shiftleft(cast(1 as bigint), cast(h % $lshBits as int))"))
          .otherwise(lit(0L)).as("w"))
      .groupBy("vec_id", "t")
      .agg(sum("w").as("bk"))
  }

  /** Distinct LSH candidate pairs (q_id, n_id): a corpus vector is a
    * candidate iff it shares a (table, bucket) key with the query —
    * a banded equi-join on the bucket table, never all-pairs (the
    * probe touches ~T/2^B of the corpus; measured 0.23-0.25 at both
    * fixture SFs for recall 0.51, vs 0.25 scan for the trained IVF).
    * Exposed for the OperatorsSpec candidate-fraction bound. */
  private[graft] def lshCandidates(s: SparkSession, d: String): DataFrame = {
    val b = lshBuckets(s, d)
    val qb = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("t"), col("bk"))
    broadcast(qb).join(b, Seq("t", "bk"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
  }

  /** Streaming SRP-LSH index maintenance — the ingest loop of the
    * v_lsh_topk/v_knn_graph bucket index: each micro-batch of vectors
    * is bucketed ([[lshBucketRows]] — a pure per-row function of the
    * vector: PRF planes, integer micro-units, no trained state at
    * all) and appended into the cdcApply versioned store keyed by
    * (vec_id, t) — union + key-dedup merge, idempotent under
    * foreachBatch retries and batch-partitioning-invariant, so the
    * maintained index equals the batch-built [[lshBuckets]] exactly
    * (EventStreamsSpec pins a hash-split multi-batch fold). Per-batch
    * I/O is O(dirty buckets), never the standing index — the same
    * cdcApply append shape as the minhash band index
    * (st_index_maintain) and the IVF postings (st_ann_maintain),
    * closing the vector tier's last static-index gap. */
  private[graft] def lshMaintainFold(s: SparkSession, changes: DataFrame,
      d: String, stateDir: String): DataFrame = {
    val init = lshBucketRows(s, vecs(s, d).limit(0))
    graft.streaming.EventStreams.cdcApply(s, changes, init, stateDir,
      Seq("vec_id", "t"),
      batch => lshBucketRows(batch.sparkSession, vecProjection(batch)),
      (state, delta) => state.unionByName(delta)
        .dropDuplicates("vec_id", "t"))
  }

  /** Oracle for [[lshMaintainFold]]: the batch bucket build over the
    * whole corpus — exactly what the maintained store converges to. */
  private[queries] def lshMaintainSql: String =
    s"""$lshIndexSql
      |SELECT vec_id, t, bk FROM bk
      |ORDER BY vec_id, t""".stripMargin

  /** Streaming ANN postings maintenance — the ingest loop of a stored
    * IVF index: each micro-batch of vectors is assigned to its
    * nearest centroid ([[assignToCells]] — refit-free, scan-local,
    * centroids broadcast) and appended into the cdcApply versioned
    * postings store keyed by vec_id (assignment is a pure function of
    * the vector, so union + key-dedup merge is idempotent under
    * foreachBatch retries and batch-partitioning-invariant). Per-batch
    * I/O is O(dirty buckets), never the standing postings. Returns the
    * maintained (vec_id, cell_id) assignment. */
  private[graft] def annMaintainFold(s: SparkSession, changes: DataFrame,
      d: String, stateDir: String): DataFrame = {
    val (_, centroids) = kmeansIndex(s, d)
    val init = assignToCells(vecs(s, d).limit(0), centroids)
    graft.streaming.EventStreams.cdcApply(s, changes, init, stateDir,
      Seq("vec_id"),
      batch => assignToCells(vecProjection(batch), centroids),
      (state, delta) => state.unionByName(delta).dropDuplicates("vec_id"))
  }

  /** st_ann_maintain body: fold the streamed corpus into the postings
    * store, then serve the standard IVF probe path from the MAINTAINED
    * assignment. Every assignment comes from the rounded-cdist rule,
    * so unlike v_ann_kmeans (trained transform) the full maintained
    * index replays in DuckDB from the centroid snapshot alone. */
  private[queries] def annMaintain(s: SparkSession, srcPath: String,
      d: String, stateDir: String): DataFrame = {
    val asg = annMaintainFold(s,
      graft.streaming.EventStreams.streamSource(s, srcPath), d, stateDir)
    ivfServe(vecs(s, d), kmeansIndex(s, d)._2, asg)
  }

  /** Nearest-centroid assignment subquery over relation `rel` — the
    * SQL twin of [[assignToCells]]/[[centroidRank]] (rounded cdist,
    * c_id tie-break), defined ONCE and consumed by both the
    * v_ann_incremental add path and the st_ann_maintain oracle. */
  private def nearestCentroidSql(rel: String): String =
    s"""(SELECT vec_id, cell_id FROM (
       |  SELECT n.vec_id, c.c_id AS cell_id,
       |    row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |      round(sqrt(list_dot_product(c.cv, c.cv))
       |              * sqrt(list_dot_product(c.cv, c.cv))
       |            - 2 * list_dot_product(n.v, c.cv) / n.nrm, 6) ASC,
       |      c.c_id) AS rn
       |  FROM $rel n CROSS JOIN cents c) WHERE rn = 1)""".stripMargin

  /** Oracle for [[annMaintain]]: the incremental-add nearest-centroid
    * rule applied to the WHOLE corpus (that is exactly what the
    * maintained store converges to), then the shared serve-path SQL. */
  private[queries] def annMaintainSql: String =
    ivfServeSql(s"fasg AS ${nearestCentroidSql("e")}")

  private val pqSubspaces = 8 // 64-d → 8 sub-vectors of 8 dims
  private val pqCodes = 16 // codewords per subspace (4-bit codes)
  private val pqRerank = 64 // ADC survivors re-ranked exactly

  /** Trained product-quantization index, memoized per (session, dir)
    * like [[kmeansIndex]]: per-subspace codebooks (fit once on unit
    * sub-vectors so ADC inner products approximate cosine) and the
    * corpus code table. At scale the code table IS the artifact: 8
    * 4-bit codes per vector — a 64× compression of float64 — stored
    * alongside the corpus and scanned instead of it. Returns
    * (codes: vec_id, subspace, code; codebook: subspace, code, cv). */
  private val pqCache = Memo.dfPairTable

  private def pqIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    pqCache(s, d) {
      locally {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val e = vecs(s, d)
        val dim = 8 // dims per subspace
        val fitted = (0 until pqSubspaces).map { j =>
          val feats = e.select(col("vec_id"),
            array_to_vector(
              slice(transform(col("v"), x => x / col("nrm")), j * dim + 1, dim))
              .as("features"))
          val model = new KMeans()
            .setK(pqCodes).setSeed(42L + j).setMaxIter(10)
            .fit(feats)
          val codesJ = model.transform(feats)
            .select(col("vec_id"), lit(j).as("subspace"),
              col("prediction").as("code"))
          val bookJ = model.clusterCenters.zipWithIndex.toSeq
            .map { case (c, i) => (j, i, c.toArray) }
          (codesJ, bookJ)
        }
        val codes = fitted.map(_._1).reduce(_ unionByName _).cache()
        val codebook = s.createDataFrame(fitted.flatMap(_._2))
          .toDF("subspace", "code", "cv").cache()
        (codes, codebook)
      }
    }

  val all: Seq[QueryDef] = Seq(

    // Graph embeddings (GDS fastRP capability parity): node vectors
    // for the LSH dup-pair graph via deterministic very-sparse random
    // projection + 2 rounds of integer neighbor-mean propagation
    // (GraphAlgorithms.fastRpEmbedDF) — the bridge from the graph
    // tier into this ANN tier (same-community docs land near each
    // other; OperatorsSpec-style locality pinned in
    // GraphAlgorithmsSpec). Fully oracled: the PRF init (60-bit md5
    // mod 4 → {+1e6, −1e6, 0}) and both propagation rounds replay as
    // unrolled CTEs; Spark `div` and DuckDB `//` agree (toward-zero)
    // on negatives, so the hash is bit-exact.
    QueryDef(
      "v_graph_embed",
      s"""${DedupQueries.lshPairsSql},
        |und AS (SELECT d1 AS a, d2 AS b FROM pairs
        |        UNION SELECT d2, d1 FROM pairs),
        |verts AS (SELECT DISTINCT a AS id FROM und),
        |deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
        |dims AS (SELECT unnest(generate_series(0, 7)) AS dim),
        |e0 AS (SELECT v.id, d.dim,
        |         CASE ${DedupQueries.duckHex60(
               "(CAST(v.id AS VARCHAR) || ':' || CAST(d.dim AS VARCHAR))")} % 4
        |           WHEN 0 THEN CAST(1000000 AS BIGINT)
        |           WHEN 1 THEN CAST(-1000000 AS BIGINT)
        |           ELSE CAST(0 AS BIGINT) END AS val
        |       FROM verts v, dims d),
        |e1 AS (SELECT u.a AS id, e.dim,
        |         CAST(sum(e.val) AS BIGINT) // dg.deg AS val
        |       FROM und u JOIN deg dg ON dg.a = u.a
        |                  JOIN e0 e ON e.id = u.b
        |       GROUP BY u.a, e.dim, dg.deg),
        |e2 AS (SELECT u.a AS id, e.dim,
        |         CAST(sum(e.val) AS BIGINT) // dg.deg AS val
        |       FROM und u JOIN deg dg ON dg.a = u.a
        |                  JOIN e1 e ON e.id = u.b
        |       GROUP BY u.a, e.dim, dg.deg)
        |SELECT e1.id AS doc_id, e1.dim AS dim, e1.val + e2.val AS val
        |FROM e1 JOIN e2 ON e2.id = e1.id AND e2.dim = e1.dim
        |ORDER BY doc_id, e1.dim""".stripMargin) { (s, d) =>
      graft.graph.GraphAlgorithms.fastRpEmbedDF(
        DedupQueries.lshPairs(s, d), "d1", "d2",
        dims = 8, iterations = 2)
        .select(col("id").cast("long").as("doc_id"), col("dim"), col("val"))
        .orderBy("doc_id", "dim")
    },

    // Walk-based graph embeddings (GDS node2vec capability parity —
    // gfe-db/database/template.yaml:262-263 leaves gds.* unrestricted)
    // next to v_graph_embed's propagation-family fastRP: the SAME
    // deterministic md5-PRF walk corpus d_dup_random_walk emits,
    // folded to hashed window-co-occurrence count vectors
    // (GraphAlgorithms.walkEmbedDF — node2vec's statistics with
    // feature hashing standing in for SGD, keeping the whole path
    // integer-exact and oracle-replayable). The oracle chains the
    // shared walk CTEs (ONE derivation with d_dup_random_walk) into
    // the co-occurrence fold; locality (same-clique vectors closer
    // than cross-clique) is pinned in GraphAlgorithmsSpec.
    QueryDef(
      "v_walk_embed",
      s"""${DedupQueries.lshPairsSql},
        |${DedupQueries.walkCtesSql(4)},
        |co AS (SELECT a.node AS id,
        |         ${DedupQueries.duckHex60(
             "('we:' || CAST(b.node AS VARCHAR))")} % 16 AS dim
        |       FROM wk a JOIN wk b ON b.walk = a.walk AND b.s <> a.s
        |                          AND abs(b.s - a.s) <= 2)
        |SELECT CAST(id AS BIGINT) AS doc_id, CAST(dim AS BIGINT) AS dim,
        |       count(*) AS val
        |FROM co GROUP BY 1, 2
        |ORDER BY doc_id, dim""".stripMargin) { (s, d) =>
      val pairs = DedupQueries.lshPairs(s, d)
      val sources = pairs.select(col("d1").as("id"))
        .unionByName(pairs.select(col("d2").as("id")))
        .distinct().where(col("id") % 5 === 0)
      graft.graph.GraphAlgorithms.walkEmbedDF(
        pairs, "d1", "d2", sources, steps = 4, window = 2, dims = 16)
        .select(col("id").cast("long").as("doc_id"), col("dim"), col("val"))
        .orderBy("doc_id", "dim")
    },

    // Product-quantization ANN (the classic 100 TB vector tier):
    // corpus vectors live as 8 codebook codes (64× smaller than the
    // floats), each query builds a 8×16-entry inner-product table
    // against the codebooks (broadcast — ~1k rows for the whole query
    // batch), and the asymmetric-distance scores are ONE scan of the
    // code table + a map-side-combined sum; the floats are touched
    // only to re-rank the pqRerank survivors exactly. ADC table
    // entries are quantized to integer micro-units — what a real ADC
    // lookup table does anyway — so the partial-sum aggregation is
    // order-independent (integer adds) and the whole probe path
    // replays bit-exactly. Oracle: the trained index is snapshot to
    // [[dumpAux]] (codebook + code table — the TRAINING is the trust
    // boundary, like the Louvain assignment); DuckDB re-derives the
    // ADC table from raw query vectors ⨝ snapshot codebooks, rescans
    // the snapshot code table, and re-ranks survivors with exact
    // cosine. OperatorsSpec still bounds recall against the exact
    // baseline and the random expectation.
    QueryDef(
      "v_pq_topk",
      s"""WITH e AS ($duckVecs),
        |cb AS (SELECT subspace, code, list(cj ORDER BY j) AS cv
        |       FROM ${aux("pq_codebook")} GROUP BY 1, 2),
        |codes AS (SELECT vec_id, subspace, code FROM ${aux("pq_codes")}),
        |q AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS qv
        |      FROM e WHERE vec_id < $nQueries),
        |dtable AS (
        |  SELECT q.vec_id AS q_id, cb.subspace, cb.code,
        |         CAST(round(list_dot_product(
        |           (q.qv)[cb.subspace*8+1 : cb.subspace*8+8], cb.cv)
        |           * 1000000) AS BIGINT) AS part
        |  FROM q CROSS JOIN cb),
        |cand AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT t.q_id, c.vec_id AS n_id, sum(t.part) AS adc,
        |           row_number() OVER (PARTITION BY t.q_id
        |             ORDER BY sum(t.part) DESC, c.vec_id) AS rn
        |    FROM codes c JOIN dtable t
        |      ON t.subspace = c.subspace AND t.code = c.code
        |    WHERE t.q_id <> c.vec_id GROUP BY t.q_id, c.vec_id)
        |  WHERE rn <= $pqRerank),
        |${rerankSql("q_id", "n_id", topK)}""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val (codes, codebook) = pqIndex(s, d)
      val dim = 8
      val q = e.where(col("vec_id") < nQueries)
      val qsub = q.select(col("vec_id").as("q_id"),
        posexplode(transform(sequence(lit(0), lit(pqSubspaces - 1)),
          j => slice(transform(col("v"), x => x / col("nrm")),
            j * dim + lit(1), lit(dim))))
          .as(Seq("subspace", "qv")))
      val dtable = qsub.join(broadcast(codebook), "subspace")
        .select(col("q_id"), col("subspace"), col("code"),
          round(dot(col("qv"), col("cv")) * 1000000).cast("long").as("part"))
      val approx = codes
        .join(broadcast(dtable), Seq("subspace", "code"))
        .where(col("q_id") =!= col("vec_id"))
        .groupBy(col("q_id"), col("vec_id").as("n_id"))
        .agg(sum("part").as("adc"))
        .withColumn("rn", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("adc").desc, col("n_id"))))
        .where(col("rn") <= pqRerank)
        .select("q_id", "n_id")
      rerankTopK(approx, broadcast(q), e, "q_id", "n_id", topK)
    },

    // Brute-force cosine top-k, the exact baseline.
    QueryDef(
      "v_cosine_topk",
      s"""WITH e AS ($duckVecs),
        |q AS (SELECT * FROM e WHERE vec_id < $nQueries),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 4) AS sim
        |  FROM q JOIN e ON q.vec_id <> e.vec_id)
        |SELECT q_id, n_id, sim FROM (
        |  SELECT q_id, n_id, sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
        |  FROM scored)
        |WHERE rn <= $topK ORDER BY q_id, n_id""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val q = e.where(col("vec_id") < nQueries)
      val scored = broadcast(q.as("q"))
        .join(e.as("e"), col("q.vec_id") =!= col("e.vec_id"))
        .select(
          col("q.vec_id").as("q_id"), col("e.vec_id").as("n_id"),
          round(dot(col("q.v"), col("e.v")) / (col("q.nrm") * col("e.nrm")), 4)
            .as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= topK)
        .select("q_id", "n_id", "sim")
        .orderBy("q_id", "n_id")
    },

    // Cosine RANGE search: every corpus vector within a similarity
    // radius of each query (the "all near neighbors" dual of top-k —
    // recall-critical uses like semantic decontamination need the
    // complete ball, not the k nearest). Same broadcast-queries /
    // stream-the-corpus shape as v_cosine_topk but with NO per-query
    // window: the threshold filter runs scan-side in the same
    // codegen'd stage as the dot product, so nothing but hits ever
    // materializes — at 100 TB this is one corpus pass regardless of
    // hit count.
    QueryDef(
      "v_range_search",
      s"""WITH e AS ($duckVecs),
        |q AS (SELECT * FROM e WHERE vec_id < $nQueries)
        |SELECT q_id, n_id, sim FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |         round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 4) AS sim
        |  FROM q JOIN e ON q.vec_id <> e.vec_id)
        |WHERE sim >= 0.2 ORDER BY q_id, n_id""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val q = e.where(col("vec_id") < nQueries)
      broadcast(q.as("q"))
        .join(e.as("e"), col("q.vec_id") =!= col("e.vec_id"))
        .select(
          col("q.vec_id").as("q_id"), col("e.vec_id").as("n_id"),
          round(dot(col("q.v"), col("e.v")) / (col("q.nrm") * col("e.nrm")), 4)
            .as("sim"))
        .where(col("sim") >= 0.2)
        .orderBy("q_id", "n_id")
    },

    // IVF cell-probe ANN: assign → probe → exact-score within cells.
    QueryDef(
      "v_ann_ivf",
      s"""WITH e AS ($duckVecs),
        |c AS (SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM e WHERE vec_id < $nCentroids),
        |assign AS (
        |  SELECT vec_id, c_id AS cell_id FROM (
        |    SELECT e.vec_id, c.c_id,
        |           row_number() OVER (PARTITION BY e.vec_id
        |             ORDER BY round(list_dot_product(e.v, c.cv) / (e.nrm * c.cnrm), 4) DESC, c.c_id) AS rn
        |    FROM e, c) WHERE rn = 1),
        |q AS (SELECT * FROM e WHERE vec_id < $nQueries),
        |probe AS (
        |  SELECT q_id, c_id AS cell_id FROM (
        |    SELECT q.vec_id AS q_id, c.c_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY round(list_dot_product(q.v, c.cv) / (q.nrm * c.cnrm), 4) DESC, c.c_id) AS rn
        |    FROM q, c) WHERE rn <= $nProbe),
        |cand AS (
        |  SELECT p.q_id, a.vec_id AS n_id
        |  FROM probe p JOIN assign a ON a.cell_id = p.cell_id
        |  WHERE p.q_id <> a.vec_id)
        |SELECT q_id, n_id, sim FROM (
        |  SELECT cand.q_id, cand.n_id,
        |         round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 4) AS sim,
        |         row_number() OVER (PARTITION BY cand.q_id
        |           ORDER BY round(list_dot_product(q.v, e.v) / (q.nrm * e.nrm), 4) DESC, cand.n_id) AS rn
        |  FROM cand JOIN q ON q.vec_id = cand.q_id
        |            JOIN e ON e.vec_id = cand.n_id)
        |WHERE rn <= $ivfK ORDER BY q_id, n_id""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val c = e.where(col("vec_id") < nCentroids)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
      def simTo(v: Column, n: Column): Column =
        round(dot(v, col("cv")) / (n * col("cnrm")), 4)
      // assign every corpus vector to its nearest centroid (broadcast K)
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("csim").desc, col("c_id"))
      val assign = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("c_id"), simTo(col("v"), col("nrm")).as("csim"))
        .withColumn("rn", row_number().over(wAssign))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("c_id").as("cell_id"))
      // queries probe their nProbe nearest cells
      val q = e.where(col("vec_id") < nQueries)
      val probe = q.crossJoin(broadcast(c))
        .select(col("vec_id").as("q_id"), col("c_id"),
          simTo(col("v"), col("nrm")).as("csim"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("q_id")
            .orderBy(col("csim").desc, col("c_id"))))
        .where(col("rn") <= nProbe)
        .select(col("q_id"), col("c_id").as("cell_id"))
      // exact score only inside probed cells
      val cand = broadcast(probe)
        .join(assign, "cell_id")
        .where(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      val scored = cand
        .join(broadcast(q.select(col("vec_id").as("q_id"),
          col("v").as("qv"), col("nrm").as("qnrm"))), "q_id")
        .join(e.select(col("vec_id").as("n_id"),
          col("v").as("nv"), col("nrm").as("nnrm")), "n_id")
        .select(col("q_id"), col("n_id"),
          round(dot(col("qv"), col("nv")) / (col("qnrm") * col("nnrm")), 4)
            .as("sim"))
      scored.withColumn("rn",
        row_number().over(Window.partitionBy("q_id")
          .orderBy(col("sim").desc, col("n_id"))))
        .where(col("rn") <= ivfK)
        .select("q_id", "n_id", "sim")
        .orderBy("q_id", "n_id")
    },

    // IVF with TRAINED centroids: same assign → probe → re-rank plan
    // as v_ann_ivf, but the coarse quantizer is k-means (fixed seed)
    // instead of arbitrary corpus vectors — cells follow the data
    // distribution, so recall-per-probe is what a production IVF
    // delivers. Training is one-time index build (memoized; at scale a
    // sampled fit + stored index); probing stays broadcast-only.
    // The k-means fit is engine-specific, so the trained index is the
    // oracle's trust boundary ([[dumpAux]] snapshot); everything
    // downstream — probe ranking, candidate generation, exact scoring,
    // top-k — replays in DuckDB. OperatorsSpec asserts absolute mean
    // recall >= 0.5 against the exact cosine baseline and > the
    // random-partition expectation (nProbe/nCells).
    // (v_ann_ivf is NOT a fair yardstick: its fixture centroids make
    // every query its own centroid, trivially co-locating neighbors.)
    QueryDef(
      "v_ann_kmeans",
      ivfServeSql(
        s"""fasg AS (SELECT vec_id, cell_id FROM ${aux("ann_assign")})""")) { (s, d) =>
      val e = vecs(s, d)
      val (assign, centroids) = kmeansIndex(s, d)
      ivfServe(e, centroids, assign)
    },

    // Incremental index maintenance — the ADD path of a stored IVF
    // index: a new vector batch (vec_id % 10 = 7) joins the index by
    // nearest-centroid assignment alone — NO refit, the O(batch ×
    // centroids) scan-local step a vector store runs on every ingest
    // — and the serve path probes the standing assignment unioned
    // with the fresh one. The assignment metric is the same rounded
    // cdist as the probe, so unlike the training step the ENTIRE
    // incremental path replays in DuckDB from raw vectors + the
    // centroid snapshot; only the original training stays the trust
    // boundary. OperatorsSpec pins add-assignment ≡ trained
    // assignment on re-assigned vectors (nearest-centroid is exactly
    // what the fitted model's transform computes).
    QueryDef(
      "v_ann_incremental",
      ivfServeSql(s"""sasg AS (SELECT vec_id, cell_id FROM ${aux("ann_assign")}
        |        WHERE vec_id % 10 <> 7),
        |newv AS (SELECT * FROM e WHERE vec_id % 10 = 7),
        |nasg AS ${nearestCentroidSql("newv")},
        |fasg AS (SELECT * FROM sasg UNION ALL SELECT * FROM nasg)""".stripMargin)) { (s, d) =>
      val e = vecs(s, d)
      val (assign, centroids) = kmeansIndex(s, d)
      val standing = assign.where(col("vec_id") % 10 =!= 7)
      val fresh = assignToCells(e.where(col("vec_id") % 10 === 7), centroids)
      ivfServe(e, centroids, standing.unionByName(fresh))
    },

    // LSH-bucketed ANN — the brief's named scale path next to IVF:
    // sign-random-projection (SRP) buckets, probe = one banded
    // equi-join on (table, bucket_key), exact cosine re-rank only on
    // collisions. The index build is one corpus pass (posexplode →
    // broadcast plane join → two codegen'd hash aggs); the md5-PRF
    // planes and integer micro-unit arithmetic make the ENTIRE path —
    // index, probe, candidates — deterministic and engine-exact, so
    // the oracle replays it from raw vectors with zero trust-boundary
    // snapshot (the trained-index tiers can't). Parameters 16×6 were
    // measured against the exact baseline at both fixture SFs:
    // recall 0.51 at candidate fraction 0.23-0.25 (random bucketing
    // at the same fraction would recall ~0.24); OperatorsSpec pins
    // both bounds.
    QueryDef(
      "v_lsh_topk",
      s"""$lshIndexSql,
        |qb AS (SELECT vec_id AS q_id, t, bk FROM bk WHERE vec_id < $nQueries),
        |cand AS (SELECT DISTINCT qb.q_id, b.vec_id AS n_id
        |         FROM qb JOIN bk b ON b.t = qb.t AND b.bk = qb.bk
        |         WHERE b.vec_id <> qb.q_id),
        |${rerankSql("q_id", "n_id", topK)}""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val q = e.where(col("vec_id") < nQueries)
      rerankTopK(lshCandidates(s, d), broadcast(q), e, "q_id", "n_id", topK)
    },

    // kNN-GRAPH construction (GDS `gds.knn` capability parity, and
    // the input shape for graph-based dedup/clustering over an
    // embedding corpus): top-k cosine neighbors for EVERY vector, not
    // just a query batch. All-pairs is quadratic and never acceptable
    // at scale; candidates come from the same LSH bucket index as
    // v_lsh_topk — a banded SELF-join (T × Σ|bucket|² pairs, ~23% of
    // the pair space at fixture tuning), then one exact re-rank per
    // source. The corpus side joins by fixed-width vec_id — shuffle
    // hash joins sized by AQE, no broadcast of the big side. Measured
    // vs the exact kNN graph: recall 0.56/0.52 (sf0.001/sf0.01), all
    // vertices covered. Deterministic end-to-end → fully oracled, no
    // snapshot. Skew note: Σ|bucket|² is quadratic in the LARGEST
    // bucket, and the realistic inflater is exact-duplicate vectors
    // (identical signatures in every table) — at scale run exact
    // dedup (d_exact_dedup's hash-groupBy on the vector bytes)
    // upstream, which removes that mass; residual hot buckets are
    // ordinary AQE skew-join territory because the probe is a plain
    // equi-join.
    QueryDef(
      "v_knn_graph",
      s"""$lshIndexSql,
        |cand AS (SELECT DISTINCT b1.vec_id AS src_id, b2.vec_id AS nbr_id
        |         FROM bk b1 JOIN bk b2 ON b2.t = b1.t AND b2.bk = b1.bk
        |         WHERE b1.vec_id <> b2.vec_id),
        |${rerankSql("src_id", "nbr_id", knnK)}""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val b = lshBuckets(s, d)
      val cand = b.select(col("vec_id").as("src_id"), col("t"), col("bk"))
        .join(b.select(col("vec_id").as("nbr_id"), col("t"), col("bk")),
          Seq("t", "bk"))
        .where(col("src_id") =!= col("nbr_id"))
        .select("src_id", "nbr_id").distinct()
      rerankTopK(cand, e, e, "src_id", "nbr_id", knnK)
    },

    // Int8-quantized top-k: per-vector symmetric quantization
    // (q[i] = round(127·v[i]/max|v|)) and EXACT integer dot products.
    // This is the memory-bandwidth tier of a 100 TB vector store — the
    // quantized table is 8× smaller than float64, the candidate scan
    // reads only int8-width data, and because the arithmetic is
    // integral the oracle compare is exact (no float summation-order
    // hazard). Float re-rank on the survivors is `v_cosine_topk`.
    QueryDef(
      "v_quantized_topk",
      s"""WITH e AS ($duckVecs),
        |m AS (SELECT vec_id, v, greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) AS mx FROM e),
        |qt AS (SELECT vec_id, list_transform(v, x -> CAST(round(127 * x / mx) AS BIGINT)) AS q FROM m),
        |qq AS (SELECT * FROM qt WHERE vec_id < $nQueries),
        |scored AS (
        |  SELECT qq.vec_id AS q_id, qt.vec_id AS n_id,
        |         CAST(list_dot_product(qq.q, qt.q) AS BIGINT) AS qdot
        |  FROM qq JOIN qt ON qq.vec_id <> qt.vec_id)
        |SELECT q_id, n_id, qdot FROM (
        |  SELECT q_id, n_id, qdot,
        |         row_number() OVER (PARTITION BY q_id ORDER BY qdot DESC, n_id) AS rn
        |  FROM scored)
        |WHERE rn <= $topK ORDER BY q_id, n_id""".stripMargin) { (s, d) =>
      val e = vecs(s, d)
      val mx = greatest(
        array_max(transform(col("v"), x => abs(x))), lit(1e-12))
      val qt = e.select(col("vec_id"),
        transform(col("v"), x => round(lit(127) * x / mx, 0).cast("long"))
          .as("q"))
      val q = qt.where(col("vec_id") < nQueries)
      val scored = broadcast(q.as("q"))
        .join(qt.as("e"), col("q.vec_id") =!= col("e.vec_id"))
        .select(col("q.vec_id").as("q_id"), col("e.vec_id").as("n_id"),
          aggregate(
            zip_with(col("q.q"), col("e.q"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("qdot"))
      scored.withColumn("rn",
        row_number().over(Window.partitionBy("q_id")
          .orderBy(col("qdot").desc, col("n_id"))))
        .where(col("rn") <= topK)
        .select("q_id", "n_id", "qdot")
        .orderBy("q_id", "n_id")
    }
  )

  /** Aux snapshot of the TRAINED ANN indexes (same trust boundary as
    * the Louvain assignment / gfe graph snapshots): the k-means
    * centroids + cell assignment and the PQ codebooks + code table
    * land in parquet so the v_ann_kmeans / v_pq_topk oracles can
    * replay probe, candidate generation, ADC scoring, and re-rank in
    * DuckDB. Training itself is the engine-specific part; its
    * QUALITY contract (recall bounds) lives in OperatorsSpec. Array
    * columns are exploded to (id, j, value) rows — the oracle
    * reassembles with list(x ORDER BY j), preserving summation
    * order, so float dot products match bit-for-bit. Called by
    * [[graft.Verify]] after the query runs (the memoized index is
    * reused, so snapshot and query-time index are identical). */
  def dumpAux(s: SparkSession, d: String): Unit = {
    val auxDir = GfeQueries.auxDir
    val (assign, centroids) = kmeansIndex(s, d)
    centroids
      .select(col("c_id"), posexplode(col("cv")).as(Seq("j", "cj")))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ann_centroids")
    assign
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/ann_assign")
    val (codes, codebook) = pqIndex(s, d)
    codebook
      .select(col("subspace"), col("code"),
        posexplode(col("cv")).as(Seq("j", "cj")))
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/pq_codebook")
    codes
      .coalesce(1).write.mode("overwrite").parquet(s"$auxDir/pq_codes")
  }
}
