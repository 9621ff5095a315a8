package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation by key salting — for the cases AQE's
  * runtime skew-join split can't see (e.g. a skewed aggregation, or a
  * join whose skew appears only after filters).
  *
  * Join form: the probe side gets a deterministic salt in [0, n) from
  * a high-cardinality discriminator column; the build side is
  * replicated n× (one copy per salt). The join key becomes
  * (key, salt), so a hot key's rows spread over n reducers instead of
  * one. Replication is bounded: n × |build|.
  *
  * Aggregation form: two-phase — partial aggregate on (key, salt),
  * final aggregate on key. The hot key's partials spread over n
  * reducers; the final phase sees at most n rows per key.
  */
object SkewJoin {

  /** Salted inner equi-join on `key`, frequency-gated: only keys
    * measured hotter than `hotFactor` × the mean key frequency are
    * salted (build-side replication is paid only where the skew is);
    * everything else goes through the plain join, and the two results
    * union. With no hot keys this IS the plain join plus one cheap
    * map-side-combined count over the probe keys.
    *
    * `discriminator` must be a high-cardinality column on `left`
    * (used to spread rows deterministically — no rand(), so
    * retries/AQE replays are safe). The hot-key set is collected to
    * the driver (bounded by `maxHotKeys`) — hot keys are by
    * definition few, or salting is the wrong tool.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      discriminator: String, salts: Int = 16,
      hotFactor: Double = 4.0, maxHotKeys: Int = 10000): DataFrame = {
    val freq = left.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
    val stats = freq.agg(
      sum(col("__cnt")).as("total"), count(lit(1)).as("nkeys")).head
    val nKeys = math.max(stats.getLong(1), 1L)
    // a key below salts×2 rows gains nothing from spreading over
    // `salts` reducers, whatever the mean says
    val threshold = math.max(
      hotFactor * stats.getLong(0) / nKeys, (salts * 2).toDouble)
    val hot = freq.where(col("__cnt") >= threshold)
      .orderBy(col("__cnt").desc).limit(maxHotKeys)
      .select(key).collect().map(_.get(0))

    if (hot.isEmpty) left.join(right, Seq(key))
    else {
      val isHot = col(key).isin(hot.toIndexedSeq: _*)
      val hotJoined = left.where(isHot)
        .withColumn("__salt", pmod(hash(col(discriminator)), lit(salts)))
        .join(right.where(isHot)
          .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1)))),
          Seq(key, "__salt"))
        .drop("__salt")
      // inner equi-join never matches null keys, so dropping them from
      // both branches (isin/!isin are null on null input) is lossless
      val plain = left.where(!isHot).join(right.where(!isHot), Seq(key))
      hotJoined.unionByName(plain)
    }
  }

  /** Salted two-phase count+sum aggregation on `key`. */
  def saltedAgg(
      df: DataFrame, key: String, valueCol: String,
      discriminator: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(discriminator)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as(s"sum_$valueCol"))
}
