// scratch: not part of the library — plan-shape evidence for the
// r15 optimization round (one fixpoint round's physical plan with and
// without the pre-partitioned edge checkpoint).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      // force shuffle joins: at bench scale neither side broadcasts,
      // and the question is whether the edge side needs an Exchange
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairsIdx =
      (for (i <- 0 until 5; j <- (i + 1) until 5) yield (i, j))
        .toSeq
    import spark.implicits._
    val pi = pairsIdx.toDF("i", "j")
    val e = spark.range(20000L).select(col("id").as("c"))
      .crossJoin(broadcast(pi))
      .select(concat(lit("v"), col("c") * 5 + col("i")).as("a"),
        concat(lit("v"), col("c") * 5 + col("j")).as("b"))
    def round(und: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val labels = und.select(col("a").as("id")).distinct()
        .withColumn("component", col("id")).localCheckpoint(true)
      val nbrMin = und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min("component").as("nbr"))
      labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
    }
    val undBase = e.toDF("a", "b")
      .unionByName(e.toDF("b", "a").select(col("a"), col("b")))
    println("=== one CC round, cached edge frame (old shape) ===")
    round(undBase.cache()).explain("formatted")
    println("=== one CC round, pre-partitioned checkpointed edge frame (new shape) ===")
    round(undBase.repartition(col("b")).localCheckpoint(true))
      .explain("formatted")
    println("=== one CC round, AQE-off pre-partitioned checkpoint ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val undP = undBase.repartition(col("b")).localCheckpoint(true)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    round(undP).explain("formatted")
    spark.stop()
  }
}
