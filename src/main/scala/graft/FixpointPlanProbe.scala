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
    spark.stop()
  }
}
