// scratch: not part of the library — r16 optimization plan evidence.
// Writes to plans/r16:
//  - xdist_scc_minprop_round_{before,after}.txt: one SCC minProp
//    round (delta edge hop + pointer-doubling self-join) with STRING
//    vertex labels vs the order-preserving dense-LONG encoding
//    (orderedVertexDict). The shape (Exchange/Sort count) is
//    IDENTICAL by construction — the claim is narrower types in every
//    exchange, sort and min-aggregate: the before plan's joins/aggs
//    key on string attributes, the after plan's on bigint (radix-
//    sortable, 8 bytes vs 24+ per UTF8String field).
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object R16PlanProbe {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "plans/r16"
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

    // the 5-cycle synthetic the xdist_scc tiers use, both key spaces
    val pi = (0 until 5).map(i => (i, (i + 1) % 5)).toDF("i", "j")
    def edges(asLong: Boolean): DataFrame = {
      val raw = spark.range(20000L).select(col("id").as("c"))
        .crossJoin(broadcast(pi))
      if (asLong)
        raw.select((col("c") * 5 + col("i")).as("a"),
          (col("c") * 5 + col("j")).as("b"))
      else
        raw.select(concat(lit("v"), col("c") * 5 + col("i")).as("a"),
          concat(lit("v"), col("c") * 5 + col("j")).as("b"))
    }

    // ONE minProp round, exactly the stronglyConnectedComponentsDF
    // inner shape: delta-sourced edge hop + min-agg, left-merge onto
    // the label frame, pointer-doubling self-join with the chg flag
    def minPropRound(e: DataFrame): DataFrame = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val eP = e.repartition(col("a")).sortWithinPartitions("a")
        .localCheckpoint(true)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val lbl = e.select(col("a").as("id")).distinct()
        .withColumn("lbl", col("id")).localCheckpoint(true)
      val chg = lbl
      val nbrMin = eP
        .join(chg.select(col("id").as("a"), col("lbl").as("albl")), "a")
        .groupBy(col("b").as("id")).agg(min("albl").as("nbr"))
      val hop = lbl.withColumnRenamed("lbl", "old")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("lbl"),
          col("old"))
        .localCheckpoint(true)
      val dbl = least(col("lbl"), coalesce(col("_plbl"), col("lbl")))
      hop
        .join(hop.select(col("id").as("_p"), col("lbl").as("_plbl")),
          col("lbl") === col("_p"), "left")
        .select(col("id"), dbl.as("lbl"), (dbl =!= col("old")).as("chg"))
    }

    dump("xdist_scc_minprop_round_before", minPropRound(edges(false)))
    dump("xdist_scc_minprop_round_after", minPropRound(edges(true)))
    spark.stop()
  }
}
