package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // DecimalType is banned from final output schemas: parquet decimal
    // columns render differently across readers (pyarrow vs DuckDB),
    // so the driver's hash compare can never match them even with
    // byte-identical values (round-2 root cause). Queries must project
    // money as BIGINT cents instead.
    def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case t: org.apache.spark.sql.types.StructType => t.fields.exists(f => hasDecimal(f.dataType))
      case t: org.apache.spark.sql.types.ArrayType => hasDecimal(t.elementType)
      case t: org.apache.spark.sql.types.MapType => hasDecimal(t.keyType) || hasDecimal(t.valueType)
      case _ => false
    }
    // Array/map/struct output columns are likewise banned: the driver
    // sorts every result (even rows-only ones) through pandas, where
    // they materialize as ndarray/dict — unhashable, and the whole
    // round's entry errors out (r3: a_approx_quantile). Project scalar
    // columns (element_at / concat_ws / to_json) instead.
    def nested(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.ArrayType => true
      case _: org.apache.spark.sql.types.MapType => true
      case _: org.apache.spark.sql.types.StructType => true
      case _ => false
    }
    // Testdata pre-flight (round 8): read every table THROUGH the
    // access layer before the query loop and print its served schema.
    // A type the layer can't serve (e.g. a ts precision drift) fails
    // the whole run here with one named diagnostic instead of
    // silently darkening every query that touches the table — the r7
    // failure mode, where the driver omits no-output queries and 24
    // entries vanished without an error line.
    Tables.names.foreach { t =>
      try {
        val df = t match {
          case "events" => Tables.events(spark, sfDir)
          case _ => Tables.table(spark, sfDir, t)
        }
        val cols = df.schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        System.err.println(s"[verify] preflight $t: $cols")
      } catch { case e: Throwable =>
        System.err.println(
          s"[verify] PREFLIGHT FAILED on table '$t': ${e.getMessage}")
        spark.stop()
        sys.exit(3)
      }
    }
    var failed = List.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val dec = df.schema.fields.filter(f => hasDecimal(f.dataType)).map(_.name)
        if (dec.nonEmpty) throw new IllegalStateException(
          s"DecimalType in output schema (${dec.mkString(",")}) — " +
            "not reader-portable; project as BIGINT cents")
        val nst = df.schema.fields.filter(f => nested(f.dataType)).map(_.name)
        if (nst.nonEmpty) throw new IllegalStateException(
          s"nested-typed output column (${nst.mkString(",")}) — " +
            "unhashable in the driver's compare; project scalars")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
      }
    }
    if (failed.nonEmpty) System.err.println(
      s"[verify] ${failed.size} of ${SparkEntry.queries.size} queries " +
        s"produced NO output (will be omitted from the driver report): " +
        failed.sorted.mkString(", "))
    // Aux snapshot for the gfe-domain oracles: the fixture graph's
    // node/edge tables land at a well-known absolute path that the
    // gfe_* oracle SQL reads via read_parquet (the EMBL flat-file
    // input itself is not DuckDB-readable; the snapshot is the trust
    // boundary — construction is spec-tested, queries hash-verified).
    try graft.queries.GfeQueries.dumpAux(spark)
    catch { case e: Throwable =>
      System.err.println(s"[verify] aux dump failed: ${e.getMessage}")
    }
    // Louvain assignment snapshot for the d_dup_louvain invariant
    // oracle (labeling / refinement / modularity re-derived in DuckDB).
    try graft.queries.DedupQueries.dumpAux(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] dedup aux dump failed: ${e.getMessage}")
    }
    // Trained-ANN index snapshots (k-means centroids/assignment, PQ
    // codebooks/codes) for the v_ann_kmeans / v_pq_topk oracles — the
    // memoized index the queries used is reused, so snapshot and
    // query-time index are identical.
    try graft.queries.SimilarityQueries.dumpAux(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] ann aux dump failed: ${e.getMessage}")
    }
    // Decoded-image hash snapshot for the mm_image_neardup oracle.
    try graft.queries.MultimodalQueries.dumpAux(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] multimodal aux dump failed: ${e.getMessage}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
