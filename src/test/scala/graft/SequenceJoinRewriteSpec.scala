package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.SequenceJoinRewrite

class SequenceJoinRewriteSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rewrites sequence-equality joins to lead with the 60-bit hash") {
    SequenceJoinRewrite.install(spark)
    graft.functions.NativeFunctions.register(spark)
    val a = Seq(("g1", "ACGTACGT"), ("g2", "TTTTCCCC"))
      .toDF("name", "sequence")
    val b = Seq(("ACGTACGT", 1L), ("GGGGAAAA", 2L))
      .toDF("sequence", "payload")
    val joined = a.join(b, a("sequence") === b("sequence"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_hex60"),
      s"rule must inject the hash key:\n$optimized")
    // results are exactly the raw-equality results
    val rows = joined.select(col("name"), col("payload")).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("g1", 1L)))
  }

  test("does not fire on other string equality joins") {
    SequenceJoinRewrite.install(spark)
    val a = Seq(("x", "k1")).toDF("name", "key")
    val b = Seq(("k1", 9L)).toDF("key", "v")
    val joined = a.join(b, a("key") === b("key"))
    assert(!joined.queryExecution.optimizedPlan.toString.contains("graft_hex60"))
    assert(joined.count() == 1)
  }

  test("registry persists partitioned by locus and round-trips") {
    import graft.gfe.GfeBuild
    import graft.ingest.ImgtFlatFile
    val r = GfeBuild.run(spark, ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3560.dat")), "3560")
    val dir = java.nio.file.Files.createTempDirectory("registry").toString + "/reg"
    GfeBuild.writeRegistry(r.registry, dir)
    assert(new java.io.File(dir).list().exists(_.startsWith("locus=")))
    val back = GfeBuild.readRegistry(spark, dir)
    assert(back.count() == r.registry.count())
    // the restored registry drives an identical incremental build
    val r2 = GfeBuild.run(spark, ImgtFlatFile.fromText(spark,
      ImgtFlatFile.resourceText("/graft/hla.3570.dat")), "3570",
      registry = Some(back))
    val name = r2.gfeSequences
      .where(col("hla_name") === "HLA-A*01:03")
      .select("gfe_name").collect().head.getString(0)
    assert(name == "HLA-Aw1-3-" + Seq.fill(15)("1").mkString("-"))
  }
}
