package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable scalar building blocks.
  *
  * Everything here composes built-in `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd) — no Scala UDFs in the hot path. Each helper
  * has an exactly-equivalent ANSI/DuckDB SQL form used by the oracle
  * checks, which is what makes the dedup/fingerprint operators
  * hash-verifiable across engines.
  */
object GraftFunctions {

  /** Portable 60-bit hash: first 15 hex digits of md5, as a Long.
    * 15 hex digits = 60 bits < 2^63, so the cast never overflows.
    * DuckDB equivalent: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`.
    *
    * Runs on the native [[Hex60]] expression (registered by
    * [[graft.SparkEntry.queries]] / [[NativeFunctions.register]]) —
    * same bits as `conv(substring(md5(c),1,15),16,10)::long` without
    * the hex-string render and string base conversion.
    */
  def hex60(c: Column): Column = call_udf("graft_hex60", c)

  /** Seeded variant for minhash families: hash the value with a seed
    * tag appended. DuckDB: same construction with `||`. */
  def hex60Seeded(c: Column, seed: Int): Column =
    hex60(concat(c, lit("#" + seed)))

  /** seq_hasher parity with the reference (P5, app.py:86-94): first 32
    * decimal digits of the md5 digest interpreted as a 128-bit integer.
    * Needs BigInteger, so this one is a UDF — used only as an id-mint,
    * never as a join/filter hot path (joins use [[hex60]]).
    */
  val seqHash: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        // BigInteger(1, bytes) == BigInteger(hexString, 16): both read
        // the digest as an unsigned big-endian 128-bit integer — skip
        // the per-row hex-string detour (reuses Hex60's thread-local
        // digest; long reference sequences make the digest itself the
        // dominant cost, but the allocation churn still matters at
        // 35k+ alleles/build).
        val d = Hex60.md5(s.getBytes("UTF-8"))
        new java.math.BigInteger(1, d).toString.take(32)
      }
    }

  /** Whitespace tokenization used by all text operators. The class is
    * spelled out rather than written `\s` because Java's `\s` includes
    * vertical tab (\x0B) while DuckDB's RE2 `\s` does not — an explicit
    * `[ \t\n\x0B\f\r]` (exactly Java's set) splits identically on both
    * engines for any input byte.
    * DuckDB: `string_split_regex(trim(x), '[ \t\n\x0B\f\r]+')`. */
  def tokens(c: Column): Column = split(trim(c), "[ \\t\\n\\x0B\\f\\r]+")

  /** Token count. DuckDB: `len(string_split_regex(trim(x),'[ \t\n\x0B\f\r]+'))`. */
  def tokenCount(c: Column): Column = size(tokens(c))
}
