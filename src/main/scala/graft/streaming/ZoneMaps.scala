package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.functions.{col, expr, max, min}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-bucket ZONE MAPS (min/max column statistics) for the versioned
  * bucket store — the data-skipping layer UNDER the key-hash pruning:
  * hash pruning answers "which buckets can hold these exact keys",
  * zone maps answer "which buckets can hold a row satisfying this
  * RANGE predicate" (`WHERE t > x`, `d BETWEEN a AND b`,
  * `s LIKE 'p%'`) — on any supported column, key or not. At 100 TB a
  * selective range predicate on an ingest-ordered or clustered column
  * (event time, release id, quality score) skips almost every bucket;
  * without zone maps it scans all of them and relies on parquet
  * row-group stats only after every file is already opened.
  *
  * The stats ride IN THE MANIFEST (an optional per-bucket field next
  * to the r15 file stats, inherited by reference for unchanged
  * buckets), so pruning is a driver-side metadata decision with ZERO
  * filesystem round-trips — same design as log-carried stats in
  * log-structured table formats, re-derived here for the store's
  * manifest protocol. Collection is one codegen'd agg job over the
  * buckets a commit just wrote (dirty-bucket-bounded, like the bloom
  * sidecars), opt-in at store creation (`zones=*` meta line) because
  * it prices one extra pass over every rewritten bucket.
  *
  * Conservative by construction — a pruning decision can only SKIP a
  * bucket that provably cannot satisfy a conjunct, never change an
  * answer:
  *  - unsupported column types, Cast-wrapped columns, non-literal
  *    comparisons: not harvested (bucket kept);
  *  - a bucket with no stats for the column (legacy entry, truncated
  *    string bound dropped): kept;
  *  - string bounds are byte-truncated at [[MaxStringBytes]] — min
  *    truncates DOWN (a byte prefix is ≤ the full string in unsigned
  *    byte order, the same order Spark's UTF8String comparisons use),
  *    max truncates UP (last-byte increment with carry; all-0xFF →
  *    bound dropped) — so truncated bounds stay bounds;
  *  - doubles: NaN compares largest (Spark's own total order) and a
  *    NaN literal disables pruning for its conjunct; -0.0 == 0.0.
  *
  * All-null is represented explicitly (`~`): the harvested conjunct
  * shapes are null-rejecting (`a > v` is never true on a null), so an
  * all-null bucket is PRUNABLE for every one of them — absent stats
  * ("don't know") must not be conflated with it.
  */
private[graft] object ZoneMaps {

  /** ordinal-in-store-schema -> None = all-null column in this bucket,
    * Some(encoded min, encoded max). Ordinals, not names: the store
    * schema is fixed at creation (`_empty`), and ordinals keep the
    * manifest field compact and name-escaping-free. */
  type BucketStats = Map[Int, Option[(String, String)]]

  /** String bounds are truncated to this many UTF-8 bytes before
    * encoding — a long text column must not bloat every manifest line
    * (Delta-style stats truncation, bound-preserving per the rules
    * above). */
  val MaxStringBytes = 64

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
        FloatType | DoubleType | DateType | TimestampType | StringType =>
      true
    case _ => false
  }

  /** The order-preserving primitive the agg job computes min/max over:
    * integrals/boolean → long, floats → double, date → epoch days,
    * timestamp → epoch micros (both exactly the Catalyst INTERNAL
    * form a pruning-time literal carries), strings as themselves
    * (Spark's min/max on strings IS unsigned-UTF-8-byte order). */
  private def statCol(f: StructField): Column = {
    val c = col(s"`${f.name}`")
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType =>
        c.cast(LongType)
      case FloatType | DoubleType => c.cast(DoubleType)
      case DateType => expr(s"unix_date(`${f.name}`)").cast(LongType)
      case TimestampType => expr(s"unix_micros(`${f.name}`)")
      case StringType => c
      case other => sys.error(s"unsupported zone-map type $other")
    }
  }

  /** Min/max of every supported column of every bucket under a
    * just-written version dir — ONE agg job (codegen'd hash agg over
    * the dirty buckets, the same shape as the bloom sidecar build),
    * encoded driver-side. Returns empty when the schema has no
    * supported column (no job runs). */
  def collect(spark: SparkSession, vdir: String,
      schema: StructType): Map[Int, BucketStats] = {
    val cols = schema.fields.zipWithIndex.filter(f => supported(f._1.dataType))
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap { case (f, i) =>
      Seq(min(statCol(f)).as(s"mn$i"), max(statCol(f)).as(s"mx$i"))
    }
    // schema is the bucket files' own (the caller's pinned table
    // schema) — declaring it, plus the partition column, skips
    // per-call parquet footer inference over the bucket dirs (r15
    // opt; the bloom sidecar build makes the same trade)
    val rows = spark.read
      .schema(schema.add("_graft_bucket",
        org.apache.spark.sql.types.IntegerType))
      .parquet(vdir)
      .groupBy(col("_graft_bucket").cast("int").as("_b"))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .collect()
    rows.map { r =>
      val stats: BucketStats = cols.toSeq.flatMap { case (f, i) =>
        val (mnI, mxI) = (r.fieldIndex(s"mn$i"), r.fieldIndex(s"mx$i"))
        if (r.isNullAt(mnI)) Some(i -> None) // rows present, all null
        else encodePair(f.dataType, r.get(mnI), r.get(mxI))
          .map(p => i -> Some(p))
      }.toMap
      r.getInt(r.fieldIndex("_b")) -> stats
    }.toMap
  }

  /** Driver-side encode of one collected (min, max); None when the
    * column's bound cannot be represented (all-0xFF truncated string
    * max) — the ordinal is then simply absent, i.e. "don't know". */
  private def encodePair(dt: DataType, mn: Any,
      mx: Any): Option[(String, String)] = dt match {
    case StringType =>
      val mnB = truncMin(mn.asInstanceOf[String].getBytes(UTF_8))
      truncMax(mx.asInstanceOf[String].getBytes(UTF_8)).map(mxB =>
        (b64(mnB), b64(mxB)))
    case FloatType | DoubleType =>
      Some((mn.asInstanceOf[Double].toString,
        mx.asInstanceOf[Double].toString))
    case _ => // every other supported type was cast to long
      Some((mn.asInstanceOf[Long].toString, mx.asInstanceOf[Long].toString))
  }

  private def b64(b: Array[Byte]): String =
    Base64.getUrlEncoder.encodeToString(b)

  private[graft] def truncMin(b: Array[Byte]): Array[Byte] =
    if (b.length <= MaxStringBytes) b else b.take(MaxStringBytes)

  /** Upper-bound truncation: last-byte increment with carry — every
    * string sharing the truncated prefix is strictly below the
    * result in unsigned byte order. All-0xFF prefix has no finite
    * successor → None. */
  private[graft] def truncMax(b: Array[Byte]): Option[Array[Byte]] =
    if (b.length <= MaxStringBytes) Some(b)
    else {
      val p = b.take(MaxStringBytes)
      var i = p.length - 1
      while (i >= 0 && p(i) == -1) i -= 1
      if (i < 0) None
      else Some {
        val out = p.take(i + 1)
        out(i) = (out(i) + 1).toByte
        out
      }
    }

  // ----- manifest field encoding -----
  //
  // `i:mn:mx` per tracked ordinal (all-null = `i:~`), ';'-joined,
  // ordinal-sorted. The alphabet is space-free by construction
  // (decimal/double renderings and URL-safe base64), so the field
  // splits on the manifest line's ' ' separator like the others;
  // readers that predate it ignore a 4th field, and its absence reads
  // as "no stats" — backwards-compatible in both directions, exactly
  // the file-stats extension's contract.

  def encodeField(s: BucketStats): Option[String] =
    if (s.isEmpty) None
    else Some(s.toSeq.sortBy(_._1).map {
      case (i, None) => s"$i:~"
      case (i, Some((mn, mx))) => s"$i:$mn:$mx"
    }.mkString(";"))

  def decodeField(f: String): BucketStats =
    f.split(';').iterator.filter(_.nonEmpty).map { e =>
      val p = e.split(':')
      if (p.length == 2 && p(1) == "~") p(0).toInt -> None
      else p(0).toInt -> Some((p(1), p(2)))
    }.toMap

  // ----- prune-time: harvest + satisfiability -----

  /** One harvested, provably-null-rejecting range conjunct on a
    * supported column, in Catalyst INTERNAL literal form. */
  sealed trait Cmp
  final case class Gt(v: Any) extends Cmp
  final case class Ge(v: Any) extends Cmp
  final case class Lt(v: Any) extends Cmp
  final case class Le(v: Any) extends Cmp
  final case class Eq(v: Any) extends Cmp
  final case class Prefix(p: Array[Byte]) extends Cmp
  /** `IS NOT NULL` — satisfied by any bucket with a non-null value,
    * so its whole effect is pruning all-null buckets (Spark pushes
    * one beside every equality/range conjunct, so this fires on
    * ordinary point reads too). */
  case object NotNull extends Cmp

  /** The (schema ordinal, comparison) conjuncts a scan's pushed
    * filters pin on supported columns. Anything not of a harvested
    * shape — Cast-wrapped columns, non-literal sides, null literals,
    * disjunctions — contributes nothing (kept buckets), never a wrong
    * skip. */
  def harvest(filters: Seq[Expression], schema: StructType,
      resolver: (String, String) => Boolean): Seq[(Int, Cmp)] = {
    def ord(a: Attribute): Option[Int] =
      schema.fields.zipWithIndex.collectFirst {
        case (f, i) if resolver(f.name, a.name) &&
            supported(f.dataType) => i
      }
    def lit(v: Any): Boolean = v != null
    filters.flatMap {
      case GreaterThan(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Gt(v))
      case GreaterThan(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Lt(v))
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Ge(v))
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Le(v))
      case LessThan(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Lt(v))
      case LessThan(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Gt(v))
      case LessThanOrEqual(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Le(v))
      case LessThanOrEqual(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Ge(v))
      case EqualTo(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Eq(v))
      case EqualTo(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Eq(v))
      case EqualNullSafe(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Eq(v))
      case EqualNullSafe(Literal(v, _), a: Attribute) if lit(v) =>
        ord(a).map(_ -> Eq(v))
      case In(a: Attribute, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        // a bounds check (any element inside [min,max]) is exactly a
        // range intersection on the set's own min/max; null elements
        // drop out soundly (`a IN (1, NULL)` keeps only a = 1 rows —
        // the filter's null result is not kept by a WHERE)
        val vs = list.collect { case Literal(v, _) if v != null => v }
        if (vs.isEmpty) None
        else ord(a).toSeq.flatMap { i =>
          val o = internalOrd(schema.fields(i).dataType)
          Seq(i -> Ge(vs.min(o)), i -> Le(vs.max(o)))
        }
      case InSet(a: Attribute, hset) if hset.exists(_ != null) =>
        ord(a).toSeq.flatMap { i =>
          val o = internalOrd(schema.fields(i).dataType)
          val vs = hset.toSeq.filter(_ != null)
          Seq(i -> Ge(vs.min(o)), i -> Le(vs.max(o)))
        }
      case StartsWith(a: Attribute, Literal(v, _)) if lit(v) =>
        ord(a).map(_ -> Prefix(v.asInstanceOf[UTF8String].getBytes))
      case org.apache.spark.sql.catalyst.expressions
          .IsNotNull(a: Attribute) =>
        ord(a).map(_ -> NotNull)
      case _ => None
    }
  }

  /** Ordering of Catalyst internal values, matching Spark's own
    * comparison semantics per type (used only to reduce IN-lists to
    * their bounds). */
  private def internalOrd(dt: DataType): Ordering[Any] = {
    val c: (Any, Any) => Int = dt match {
      case StringType => (a, b) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      case FloatType | DoubleType => (a, b) =>
        java.lang.Double.compare(numD(a), numD(b))
      case _ => (a, b) =>
        java.lang.Long.compare(numL(a), numL(b))
    }
    new Ordering[Any] { def compare(a: Any, b: Any): Int = c(a, b) }
  }

  private def numL(v: Any): Long = v match {
    case b: Boolean => if (b) 1L else 0L
    case n: java.lang.Number => n.longValue
    case other => sys.error(s"non-integral zone literal $other")
  }
  private def numD(v: Any): Double = {
    val d = v.asInstanceOf[java.lang.Number].doubleValue
    if (d == 0.0) 0.0 else d // normalize -0.0 (Spark: -0.0 == 0.0)
  }

  /** Can a bucket with `stats` possibly satisfy every harvested
    * conjunct? Per conjunct: no stats for the ordinal → yes (don't
    * know); all-null → no (the shapes are null-rejecting); otherwise
    * a bounds intersection in the column's order. */
  def keep(stats: BucketStats, conjuncts: Seq[(Int, Cmp)],
      schema: StructType): Boolean =
    conjuncts.forall { case (i, c) =>
      stats.get(i) match {
        case None => true
        case Some(None) => false
        case Some(Some((mn, mx))) =>
          satisfiable(c, mn, mx, schema.fields(i).dataType)
      }
    }

  private def satisfiable(c: Cmp, mnEnc: String, mxEnc: String,
      dt: DataType): Boolean = dt match {
    case StringType =>
      val mn = Base64.getUrlDecoder.decode(mnEnc)
      val mx = Base64.getUrlDecoder.decode(mxEnc)
      def bytes(v: Any) = v.asInstanceOf[UTF8String].getBytes
      def cmp(a: Array[Byte], b: Array[Byte]) =
        java.util.Arrays.compareUnsigned(a, b)
      c match {
        case Gt(v) => cmp(mx, bytes(v)) > 0
        case Ge(v) => cmp(mx, bytes(v)) >= 0
        case Lt(v) => cmp(mn, bytes(v)) < 0
        case Le(v) => cmp(mn, bytes(v)) <= 0
        case Eq(v) =>
          cmp(mn, bytes(v)) <= 0 && cmp(mx, bytes(v)) >= 0
        case NotNull => true
        case Prefix(p) =>
          cmp(mx, p) >= 0 && (truncMaxOf(p) match {
            case None => true // all-0xFF prefix: no finite successor
            case Some(succ) => cmp(mn, succ) < 0
          })
      }
    case FloatType | DoubleType =>
      val (mn, mx) = (mnEnc.toDouble, mxEnc.toDouble)
      // Spark's total order: NaN is largest and equal to itself —
      // java.lang.Double.compare implements exactly that; a NaN
      // LITERAL keeps the bucket (conservative; `= NaN` point reads
      // are not a pruning target), and -0.0 normalizes to 0.0
      def d(v: Any) = numD(v)
      def cm(a: Double, b: Double) = java.lang.Double.compare(
        if (a == 0.0) 0.0 else a, b)
      c match {
        case _ if litNaN(c) => true
        case Gt(v) => cm(mx, d(v)) > 0
        case Ge(v) => cm(mx, d(v)) >= 0
        case Lt(v) => cm(mn, d(v)) < 0
        case Le(v) => cm(mn, d(v)) <= 0
        case Eq(v) => cm(mn, d(v)) <= 0 && cm(mx, d(v)) >= 0
        case NotNull | Prefix(_) => true
      }
    case _ =>
      val (mn, mx) = (mnEnc.toLong, mxEnc.toLong)
      c match {
        case Gt(v) => mx > numL(v)
        case Ge(v) => mx >= numL(v)
        case Lt(v) => mn < numL(v)
        case Le(v) => mn <= numL(v)
        case Eq(v) => mn <= numL(v) && mx >= numL(v)
        case NotNull | Prefix(_) => true
      }
  }

  private def litNaN(c: Cmp): Boolean = c match {
    case Gt(v: java.lang.Number) => v.doubleValue.isNaN
    case Ge(v: java.lang.Number) => v.doubleValue.isNaN
    case Lt(v: java.lang.Number) => v.doubleValue.isNaN
    case Le(v: java.lang.Number) => v.doubleValue.isNaN
    case Eq(v: java.lang.Number) => v.doubleValue.isNaN
    case _ => false
  }

  /** [[truncMax]] on an arbitrary-length prefix (no length gate) —
    * the strict upper bound of "starts with p". */
  private def truncMaxOf(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == -1) i -= 1
    if (i < 0) None
    else Some {
      val out = p.take(i + 1)
      out(i) = (out(i) + 1).toByte
      out
    }
  }
}
