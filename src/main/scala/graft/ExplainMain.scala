// scratch: not part of the library
import org.apache.spark.sql.SparkSession
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    val t0 = System.nanoTime(); df.count()
    println(s"elapsed ${(System.nanoTime()-t0)/1e9}s")
  }
}
