package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned exact semi-join — Spark's runtime row-level filter
  * pattern as an explicit, reusable operator.
  *
  * At 100 TB the binding constraint on `fact SEMI JOIN dim` is the
  * fact-side shuffle: every fact row ships to its join partition even
  * though most will not survive. When `dim` is small Catalyst already
  * broadcasts and no shuffle happens; the interesting regime is a dim
  * side too big for a broadcast hash relation (100M+ keys) whose
  * BLOOM still fits comfortably (~1.2 MB/M keys at 1% fpp). Shape:
  *
  *   1. one dim-side aggregate builds the bloom (distributed
  *      map-side partials, driver merge — `DataFrameStatFunctions`);
  *   2. the serialized bloom rides into the fact scan as a literal
  *      and [[graft.functions.BloomMightContain]] probes it inside
  *      whole-stage codegen — rows are dropped AT THE SCAN, before
  *      the shuffle;
  *   3. the exact semi-join runs on the survivors only, clearing the
  *      ~fpp false positives. Correctness never depends on the
  *      bloom; it only shrinks the shuffle (BloomSpec pins
  *      end-to-end equality with the plain semi-join).
  */
object BloomPrune {

  /** Serialize a built filter for literal embedding. */
  def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The scan-side probe as a Column (expects the key cast to long). */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    call_udf("graft_bloom_contains", lit(bloomBytes), key)

  /** `fact LEFT SEMI JOIN dim` with the fact scan pre-pruned by a
    * bloom over `dim`'s keys. `expectedKeys <= 0` triggers an exact
    * dim-side count (fine when dim is aggregated anyway; pass an
    * estimate at scale to skip the extra job). */
  def semiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      fpp: Double = 0.01, expectedKeys: Long = -1L): DataFrame = {
    graft.functions.NativeFunctions.register(fact.sparkSession)
    val n = if (expectedKeys > 0) expectedKeys else math.max(1L, dim.count())
    val bloomBytes = serialize(dim.stat.bloomFilter(dimKey, n, fpp))
    fact
      .where(mightContain(bloomBytes, col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey), "left_semi")
  }
}
