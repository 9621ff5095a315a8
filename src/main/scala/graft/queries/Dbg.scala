package graft.queries
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val path = t("materialize corpus") { graft.gfe.SyntheticRelease.materialize(35000) }
    val r = t("build") {
      val r = graft.gfe.GfeBuild.run(spark,
        graft.ingest.ImgtFlatFile.read(spark, path.toString), "4000")
      r.allCds.count(); r.errors.count(); r
    }
    val g = t("loadAll plan") { graft.graph.GraphLoad.loadAll(spark,
      Seq(("4000", r.gfeSequences, r.allFeatures, r.allGroups))) }
    (g.vertexTables ++ g.edgeTables).toSeq.sortBy(_._1).foreach { case (n, df) =>
      t(s"count $n") { df.count() }
    }
    spark.stop()
  }
}
