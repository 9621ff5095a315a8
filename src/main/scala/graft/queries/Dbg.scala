package graft.queries

/** Dev-only profiler for the `gfe_scale_*` bench workloads: runs the
  * 35k-allele build + load N times in one JVM, in exactly the shape
  * Bench times (build = allCds+errors counts; load = loadAll +
  * concurrent 11-table materialization), printing per-iteration GC
  * time so run-to-run variance can be traced to a stage (plan
  * problem) or the collector / JIT (environment problem).
  *
  * `runMain graft.queries.Dbg [iters] [stages]` — pass `stages` to
  * also run one stage-attributed iteration (each relation counted
  * sequentially in dependency order).
  *
  * Findings this shape established (round 6): iteration 0 pays
  * ~12-25 s of JIT/codegen (the sf0.001 fixture warm-up never gets
  * the parser/feature-extraction loops hot); iterations 1+ are stable
  * at ~5-6 s build / ~6-7 s load with <0.4 s GC (the compilation tail
  * reaches through iteration ~2) — hence Bench's THREE untimed scale
  * warm-ups + median-of-3. Not part of the driver contract.
  */
object Dbg {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(4)
    val stages = args.contains("stages")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def t[A](tag: String)(f: => A): A = {
      val g0 = gcMs; val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (gc ${gcMs - g0} ms)")
      r
    }
    val path = t("materialize corpus") { graft.gfe.SyntheticRelease.materialize(35000) }
    for (i <- 0 until iters) {
      spark.catalog.clearCache()
      val g0 = gcMs; val t0 = System.nanoTime()
      val r = graft.gfe.GfeBuild.run(spark,
        graft.ingest.ImgtFlatFile.read(spark, path.toString), "4000")
      r.allCds.count(); r.errors.count()
      val tb = (System.nanoTime() - t0) / 1e9; val gb = gcMs - g0
      val g1 = gcMs; val t1 = System.nanoTime()
      val g = graft.graph.GraphLoad.loadAll(spark,
        Seq(("4000", r.gfeSequences, r.allFeatures, r.allGroups)))
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val jobs = (g.vertexTables ++ g.edgeTables).values.toSeq
          .map(df => Future(df.count()))
        jobs.foreach(Await.result(_, Duration.Inf))
      }
      val tl = (System.nanoTime() - t1) / 1e9
      println(f"[dbg] bench-shape iter $i: build $tb%.2f s (gc $gb ms), load $tl%.2f s (gc ${gcMs - g1} ms)")
    }
    if (stages) {
      println("[dbg] ===== stage-attributed iteration =====")
      spark.catalog.clearCache()
      val r = t("  build: run() plan") {
        graft.gfe.GfeBuild.run(spark,
          graft.ingest.ImgtFlatFile.read(spark, path.toString), "4000")
      }
      // Dependency order: each count pays only its new work on top of
      // the caches the previous one populated.
      t("  build: registry (scan+explode+dict shuffle)") { r.registry.count() }
      t("  build: gfeSequences (naming agg)") { r.gfeSequences.count() }
      t("  build: allFeatures (join-back)") { r.allFeatures.count() }
      t("  build: allCds (CDS map)") { r.allCds.count() }
      t("  build: errors") { r.errors.count() }
      val g = t("  load: loadAll plan + eager input caches") {
        graft.graph.GraphLoad.loadAll(spark,
          Seq(("4000", r.gfeSequences, r.allFeatures, r.allGroups)))
      }
      (g.vertexTables ++ g.edgeTables).toSeq.sortBy(_._1).foreach { case (n, df) =>
        t(s"  load: count $n") { df.count() }
      }
    }
    spark.stop()
  }
}
