package graft.queries

/** Dev-only plan auditor: `runMain graft.queries.Explain <query>
  * [sfDir]` prints the formatted physical plan of one SparkEntry
  * query — the ".explain and iterate until it's the plan you'd want"
  * loop without writing a scratch main each time. Not part of the
  * driver contract.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
