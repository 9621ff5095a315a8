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

  /** Salted inner equi-join on `key`. `discriminator` must be a
    * high-cardinality column on `left` (used to spread rows
    * deterministically — no rand(), so retries/AQE replays are safe).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      discriminator: String, salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(hash(col(discriminator)), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
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
