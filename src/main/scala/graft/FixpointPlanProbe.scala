// scratch: not part of the library — r15 optimization plan evidence
// for the iterative-fixpoint changes (bench x-tier entries; the
// declared queries all take the local fast path at fixture scale).
// Writes to plans/r15:
//  - xdist_cc_round_{before,after}.txt: one CC round with the old
//    separate change-check join vs the new chg-flag-in-checkpoint
//    shape (one V-sized exchange removed per round).
//  - fixpoint_edge_sort_{before,after}.txt: the per-round edge join
//    over a hash-partitioned checkpoint without vs with recorded
//    sortWithinPartitions order (the Sort above the edge-side
//    ExistingRDD scan disappears — the 10M-row edge frame was
//    re-sorted every round).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object FixpointPlanProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "plans/r15"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    def dump(name: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, s"$name.txt"), plan)
      val ex = "Exchange".r.findAllIn(plan).length
      val so = "\\bSort\\b".r.findAllIn(plan).length
      System.err.println(s"[probe] $name: $ex Exchange, $so Sort")
    }
    import spark.implicits._
    val pi = (0 until 5).map(i => (i, (i + 1) % 5)).toDF("i", "j")
    val e = spark.range(20000L).select(col("id").as("c"))
      .crossJoin(broadcast(pi))
      .select(concat(lit("v"), col("c") * 5 + col("i")).as("a"),
        concat(lit("v"), col("c") * 5 + col("j")).as("b"))

    // --- edge-side sort elision (partitionedCheckpoint change) ---
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val undPart = e.repartition(col("b")).localCheckpoint(true)
    val undSorted = e.repartition(col("b")).sortWithinPartitions("b")
      .localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    def round(und: DataFrame, labels: DataFrame): DataFrame =
      und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min("component").as("nbr"))
    val labels = undPart.select(col("a").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint(true)
    dump("fixpoint_edge_sort_before", round(undPart, labels))
    dump("fixpoint_edge_sort_after", round(undSorted, labels))

    // --- CC round: change-check join removed ---
    val nbrMin = round(undSorted, labels)
    // old shape: merge, then a THIRD V-sized join against the
    // previous labels purely to flag changes
    val nextOld = labels.join(nbrMin, Seq("id"), "left")
      .select(col("id"),
        least(col("component"), coalesce(col("nbr"), col("component")))
          .as("component"))
    val changedOld = nextOld
      .join(labels.withColumnRenamed("component", "old"), "id")
      .where(col("component") =!= col("old"))
    dump("xdist_cc_round_before", changedOld)
    // new shape: the chg flag rides the merged row itself
    val newLbl = least(col("old"), coalesce(col("nbr"), col("old")))
    val nextNew = labels.withColumnRenamed("component", "old")
      .join(nbrMin, Seq("id"), "left")
      .select(col("id"), newLbl.as("component"),
        (newLbl =!= col("old")).as("chg"))
    dump("xdist_cc_round_after", nextNew.where(col("chg")))

    // --- triangles: wedge self-join over cache vs partition+sort ---
    val degT = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val orientedRaw = e
      .join(degT.select(col("id").as("a"), col("deg").as("dx")), "a")
      .join(degT.select(col("id").as("b"), col("deg").as("dy")), "b")
      .select(
        when(struct(col("dx"), col("a")) < struct(col("dy"), col("b")),
          struct(col("a").as("s"), col("b").as("t"),
            struct(col("dy").as("d"), col("b").as("v")).as("tk")))
          .otherwise(struct(col("b").as("s"), col("a").as("t"),
            struct(col("dx").as("d"), col("a").as("v")).as("tk"))).as("w"))
      .select(col("w.s").as("s"), col("w.t").as("t"), col("w.tk").as("tk"))
    def wedges(o: DataFrame): DataFrame =
      o.as("p").join(o.as("q"),
        col("p.s") === col("q.s") && col("p.tk") < col("q.tk"))
        .select(col("p.s").as("u"), col("p.t").as("v"), col("q.t").as("w"))
    val oCached = orientedRaw.cache()
    oCached.count()
    dump("xdist_triangles_wedge_before", wedges(oCached))
    oCached.unpersist()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val oSorted = orientedRaw.repartition(col("s"))
      .sortWithinPartitions("s").localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    dump("xdist_triangles_wedge_after", wedges(oSorted))

    // --- pagerank: per-round merge join, vm cached vs partitioned ---
    val maskRaw = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
      .withColumn("_seed", lit(1L))
    val contrib = spark.range(100)
      .select(concat(lit("v"), col("id")).as("id"),
        (col("id") * 7L).as("in_mass"))
      .groupBy("id").agg(sum("in_mass").as("in_mass"))
    def prRound(vm: DataFrame): DataFrame =
      vm.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (col("_seed") * 150000L +
            coalesce(col("in_mass"), lit(0L))).as("r"))
    val vmPlain = maskRaw.localCheckpoint(true)
    dump("xdist_pagerank_merge_before", prRound(vmPlain))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val vmSorted = maskRaw.repartition(col("id"))
      .sortWithinPartitions("id").localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    dump("xdist_pagerank_merge_after", prRound(vmSorted))
    spark.stop()
  }
}
