package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, In, InSet, Literal, Murmur3Hash}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.SQLContext

import graft.streaming.EventStreams

/** The versioned bucket store as a first-class Spark DATA SOURCE —
  * `spark.read.format("graftstore")` and
  * `CREATE TEMPORARY VIEW g USING graftstore OPTIONS (...)`, so plain
  * DataFrame/SQL users (BI tools, notebooks, downstream pipelines that
  * know nothing of [[graft.graph.GraphStore]]'s API) read the SAME
  * marker-pinned, manifest-resolved state the probe API serves. The
  * reference exposes its loaded graph to ad-hoc consumers through a
  * query endpoint (gfe-db docs/source/reference.rst:34-37 — Cypher over
  * the standing Neo4j graph); this source is that serving surface
  * re-expressed Spark-first: the store's transaction log (manifest →
  * immutable bucket files) becomes a [[FileIndex]], exactly the
  * integration style of log-structured Spark table formats.
  *
  * Scale behavior — all three of the store's read guarantees survive
  * the translation into plain SQL, because they live in PLANNING, not
  * in the consumer's code:
  *
  *  - '''manifest resolution''': the scan reads exactly the live
  *    bucket files of one committed version — never `_temporary`
  *    half-writes, never superseded versions — so a query racing an
  *    applier sees a consistent snapshot;
  *  - '''bucket pruning''': an equality/IN predicate on the table's
  *    full bucket key (its traversal anchor) prunes the file listing
  *    to the buckets those literals hash to, at PLANNING time inside
  *    [[FileIndex.listFiles]] — `WHERE name IN (...)` on a 100 TB
  *    vertex table opens a handful of files, the declarative twin of
  *    [[graft.graph.GraphStore.probe]]. Non-anchor predicates still
  *    push down to parquet (row-group skip), they just can't skip
  *    whole buckets;
  *  - '''time travel''': `OPTION (marker k)` pins the scan to a
  *    retained release marker — [[graft.graph.GraphStore.readAt]] for
  *    SQL consumers, same I/O cost as the newest state.
  *
  * Two layouts, one source:
  *  - `dir` + `table` (+ optional `marker`): a [[graft.graph.GraphStore]]
  *    table — bucket keys come from the persisted table meta, the
  *    manifest from the release marker.
  *  - `path` (+ optional `version`, `keys`): any raw
  *    [[EventStreams.cdcApply]] store (streaming-maintained LSH bands,
  *    ANN postings, SRP buckets…) — the manifest is the store's newest
  *    (or `version`-pinned) commit; `keys` (comma-separated, in the
  *    store's cdcApply `stateKeys` DECLARATION ORDER — the bucket hash
  *    is order-sensitive) opts into bucket pruning and MUST be that
  *    bucket key: the raw layout does not persist it, so beyond column
  *    existence it cannot be validated here — wrong keys silently
  *    prune wrong (the GraphStore layout exists precisely to close
  *    that hole; prefer it when serving ad-hoc readers).
  *
  * Read-only by design: writes go through the claim-arbitrated
  * [[graft.graph.GraphStore.applyRelease]] / [[EventStreams.cdcApply]]
  * commit protocol — a bare INSERT has no release identity and no
  * merge policy, so the source refuses to be a write path rather than
  * offer one that corrupts the version history.
  */
class GraftStoreSource extends RelationProvider with StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graftstore"

  // ---- streaming: the change feed (see GraftStoreChangeSource) ----

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(GraftStoreChangeSource
      .changeSchema(sqlContext.sparkSession, parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStoreChangeSource(sqlContext.sparkSession, parameters,
      schema.getOrElse(GraftStoreChangeSource
        .changeSchema(sqlContext.sparkSession, parameters)))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val (tdir, manifest, bucketKeys, schema) =
      GraftStoreSource.resolveLayout(parameters) match {
        case GraftStoreSource.GraphLayout(dir, t) =>
          graft.graph.GraphStore.relationSpec(spark, dir, t,
            parameters.get("marker").map(_.trim.toInt))
        case GraftStoreSource.RawLayout(sd) =>
          val (m, schema) = GraftStoreSource.rawManifest(spark, sd,
            parameters.get("version").map(_.trim.toInt))
          val keys = parameters.get("keys").toSeq
            .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
          // fail at relation construction, not from inside planning:
          // a key outside the schema can never have been the store's
          // bucket key, so pruning by it would be wrong twice over
          keys.foreach(k => require(
            schema.fieldNames.exists(_.equalsIgnoreCase(k)),
            s"graftstore: keys option names '$k', which is not a column " +
              s"of $sd (columns: ${schema.fieldNames.mkString(",")}); " +
              "pass the store's cdcApply bucket key(s) or omit keys to " +
              "read without pruning"))
          (sd, m, keys, schema)
      }
    val index = new GraftStoreFileIndex(spark, tdir, manifest, bucketKeys,
      schema)
    HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = parameters)(spark)
  }
}

object GraftStoreSource {
  /** The source's two layouts — resolved in ONE place so the batch
    * relation, the stream schema, and the stream source can never
    * parse the dir/table/path options differently. */
  private[sources] sealed trait Layout
  private[sources] final case class GraphLayout(dir: String,
      table: String) extends Layout
  private[sources] final case class RawLayout(path: String) extends Layout

  private[sources] def resolveLayout(
      parameters: Map[String, String]): Layout =
    parameters.get("table") match {
      case Some(t) => GraphLayout(
        parameters.getOrElse("dir", parameters.getOrElse("path",
          sys.error("graftstore: option 'dir' (store root) is required " +
            "with 'table'"))), t)
      case None => RawLayout(parameters.getOrElse("path",
        sys.error("graftstore: pass either dir+table (GraphStore " +
          "layout) or path (raw cdcApply store)")))
    }

  /** Raw-layout manifest + schema resolution with the loud failures
    * the rest of the store uses: a non-store path or a vacuumed /
    * never-committed version names the problem and the remedy instead
    * of surfacing `empty.max` or a bare FileNotFoundException. */
  private[sources] def rawManifest(spark: SparkSession, sd: String,
      version: Option[Int]): (Map[Int, Int], StructType) = {
    val vsAll =
      try EventStreams.manifestVersions(spark, sd)
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"graftstore: $sd has no manifest/ directory — not a " +
            "cdcApply/GraphStore bucket store (check the path)", e)
      }
    require(vsAll.nonEmpty,
      s"graftstore: $sd/manifest holds no committed version — the " +
        "store's init never committed; rebuild it (cdcApply/init)")
    val v = version.getOrElse(vsAll.max)
    require(vsAll.contains(v),
      s"graftstore: $sd has no manifest v$v (versions on disk: " +
        s"${vsAll.mkString(",")}) — vacuumed or never committed; omit " +
        "'version' to read the newest")
    (EventStreams.readManifest(spark, s"$sd/manifest/v$v"),
      spark.read.parquet(s"$sd/_empty").schema)
  }
}

/** [[FileIndex]] over one manifest-pinned version of a bucket store.
  *
  * The listing is resolved ONCE at construction: a manifest references
  * only immutable bucket files (versions never rewrite in place), so
  * the index cannot go stale — a concurrent apply commits a NEW
  * manifest that this pinned scan deliberately does not see (snapshot
  * isolation, the same contract as [[graft.graph.GraphStore.read]]).
  *
  * `listFiles` is where the store's index-probe read meets Catalyst:
  * the planner hands every scan predicate down as `dataFilters`, and a
  * conjunction that pins EVERY bucket key to literals (`=`, `IN`,
  * `<=>`) is hashed driver-side with the SAME expression the writers
  * bucket by ([[EventStreams.bucketCol]]: murmur3(keys) mod width, the
  * width taken from THIS manifest so the read stays correct across a
  * rebucket) — only the hit buckets' files survive planning. Anything
  * else — a miss on one key, a non-literal comparison, a cross-product
  * of IN-lists past [[GraftStoreFileIndex.MaxKeyCombos]] — falls back
  * to the full live listing, never to a wrong answer.
  */
class GraftStoreFileIndex(
    spark: SparkSession,
    tdir: String,
    manifest: Map[Int, Int],
    bucketKeys: Seq[String],
    schema: StructType) extends FileIndex {

  // manifest width, not meta width: a manifest always carries every
  // bucket id of its layout (see GraphStore.stateForKeys)
  private val width = manifest.size

  /** bucket id → live data files, listed once against the immutable
    * version dirs the manifest references. The per-bucket listings
    * are independent small RPCs, so they run PARALLEL (bounded pool)
    * — serially, a thousands-of-buckets store on an object store
    * would pay minutes of round-trips before planning starts. The
    * listing is unavoidable at construction because the planner asks
    * [[sizeInBytes]] for CBO stats on every query; the production
    * path past even the parallel cost is persisting per-file sizes in
    * the manifest at write time (a format extension, noted not
    * built). */
  private val filesByBucket: Map[Int, Seq[FileStatus]] = {
    val (fs, _) = EventStreams.hadoopFs(spark, tdir)
    val live = manifest.toSeq.collect { case (k, v) if v >= 0 => (k, v) }
    import scala.collection.parallel.CollectionConverters._
    val pool = new java.util.concurrent.ForkJoinPool(
      math.min(32, math.max(1, live.size)))
    try {
      val par = live.par
      par.tasksupport =
        new scala.collection.parallel.ForkJoinTaskSupport(pool)
      par.map { case (k, v) =>
        val files = fs.listStatus(
            new Path(EventStreams.bucketPath(tdir, v, k)))
          .toSeq.filter { st =>
            val n = st.getPath.getName
            st.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
        k -> files
      }.toList.toMap
    } finally pool.shutdown()
  }

  private def allFiles: Seq[FileStatus] =
    filesByBucket.toSeq.sortBy(_._1).flatMap(_._2)

  override def rootPaths: Seq[Path] = Seq(new Path(tdir))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = allFiles.map(_.getLen).sum

  override def inputFiles: Array[String] =
    allFiles.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val files = prunedBuckets(dataFilters) match {
      case Some(hit) =>
        filesByBucket.toSeq.sortBy(_._1).collect {
          case (k, fs) if hit(k) => fs }.flatten
      case None => allFiles
    }
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  }

  /** The bucket ids `filters` pin, or None when the conjunction does
    * not constrain every bucket key to a literal set (fall back to the
    * full listing — pruning must never be able to change an answer). */
  private def prunedBuckets(filters: Seq[Expression]): Option[Set[Int]] = {
    if (bucketKeys.isEmpty || width == 0) return None
    val sets = equalitySets(filters)
    val perKey = bucketKeys.map(k => sets.get(k.toLowerCase))
    if (perKey.exists(_.isEmpty)) return None
    val perKeySets = perKey.map(_.get)
    // cap the cross product BEFORE expanding it — two 5k-element
    // IN-lists on a 2-key anchor would otherwise materialize 25M
    // driver-side tuples just to discover they exceed the cap
    // (an empty set means the conjunction is unsatisfiable; stay
    // conservative and let the engine's own filter return 0 rows)
    val est = perKeySets.map(_.size.toLong).foldLeft(1L)(_ * _)
    if (est == 0 || est > GraftStoreFileIndex.MaxKeyCombos) return None
    // cross product of the per-key literal sets, in bucket-key order
    val combos = perKeySets.map(_.toSeq)
      .foldLeft(Seq(Seq.empty[Any])) { (acc, vs) =>
        for (a <- acc; v <- vs) yield a :+ v
      }
    Some(combos.map(bucketOf).toSet)
  }

  /** Per-column literal equality sets from the scan's conjunctive
    * predicates, intersected when several conjuncts constrain one
    * column (`name = 'a' AND name IN ('a','b')` → {'a'}). Only shapes
    * whose literal set is EXACTLY the satisfying set are harvested —
    * a Cast-wrapped column, a null literal, a non-literal IN element
    * all leave the column unconstrained (conservative, never wrong). */
  private def equalitySets(filters: Seq[Expression]): Map[String, Set[Any]] = {
    def one(e: Expression): Option[(String, Set[Any])] = e match {
      case EqualTo(a: Attribute, Literal(v, _)) if v != null =>
        Some(a.name.toLowerCase -> Set(v))
      case EqualTo(Literal(v, _), a: Attribute) if v != null =>
        Some(a.name.toLowerCase -> Set(v))
      case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null =>
        Some(a.name.toLowerCase -> Set(v))
      case EqualNullSafe(Literal(v, _), a: Attribute) if v != null =>
        Some(a.name.toLowerCase -> Set(v))
      case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
        Some(a.name.toLowerCase ->
          list.collect { case Literal(v, _) if v != null => v }.toSet)
      case InSet(a: Attribute, hset) =>
        Some(a.name.toLowerCase -> hset.filter(_ != null))
      case _ => None
    }
    filters.flatMap(one).groupBy(_._1)
      .map { case (n, cs) => n -> cs.map(_._2).reduce(_ intersect _) }
  }

  /** The bucket one key tuple hashes to — driver-side evaluation of
    * the exact writer expression, `pmod(murmur3(keys), width)`. The
    * values are already in Catalyst internal form (they came out of
    * analyzed literals), so they feed [[Murmur3Hash]] unconverted. */
  private def bucketOf(values: Seq[Any]): Int = {
    val lits = bucketKeys.zip(values).map { case (k, v) =>
      val f = schema(schema.fieldIndex(
        schema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(k)))
      Literal(v, f.dataType)
    }
    val h = Murmur3Hash(lits, 42).eval(InternalRow.empty)
      .asInstanceOf[Int]
    ((h % width) + width) % width
  }
}

object GraftStoreFileIndex {
  /** Cap on the per-key-literal cross product a planning-time prune
    * will hash; past it the scan just reads all live buckets (a
    * 10k-element IN-list is a join-shaped read — `probeJoin` territory
    * — not a point probe, and hashing every combo on the driver would
    * trade scan I/O for planner latency). */
  val MaxKeyCombos = 4096
}
