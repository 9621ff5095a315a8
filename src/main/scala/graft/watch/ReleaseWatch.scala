package graft.watch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Release-state diffing — the reference's scheduled poll collapsed to
  * a pure driver routine (SURVEY.md §2.9/§3.1: EventBridge cron →
  * GitHub branches → set-difference → consecutive-by-10 validation,
  * invoke_pipeline/app.py:245-285; release regex `^\d{2,3}0$` at :32).
  *
  * State is a plain JSON checkpoint mirroring
  * IMGTHLA-repository-state.json; no AWS bindings.
  */
object ReleaseWatch {

  final case class WatchState(timestamp: String, releases: Seq[String])

  /** `^\d{2,3}0$` — release-shaped branch names. */
  def isReleaseShaped(name: String): Boolean =
    name.matches("^\\d{2,3}0$")

  /** O1: current \ previous (left-anti), sorted ascending. */
  def newReleases(
      spark: SparkSession,
      current: Seq[String],
      previous: Seq[String]): Seq[String] = {
    import spark.implicits._
    val cur = current.filter(isReleaseShaped).toDF("release")
    val prev = previous.toDF("release")
    cur.except(prev)
      .orderBy(col("release").cast("int"))
      .collect().map(_.getString(0)).toSeq
  }

  /** The reference's np.diff validation: every step between
    * consecutive tracked releases must be exactly +10
    * (invoke_pipeline/app.py:269-278) — as a lag window. */
  def validateConsecutive(spark: SparkSession, releases: Seq[String]): Boolean = {
    import spark.implicits._
    if (releases.length < 2) true
    else {
      val w = Window.orderBy("r")
      releases.toDF("release")
        .select(col("release").cast("int").as("r"))
        .withColumn("step", col("r") - lag(col("r"), 1).over(w))
        .where(col("step").isNotNull && col("step") =!= 10)
        .isEmpty
    }
  }

  /** JSON state checkpoint (read). */
  def readState(spark: SparkSession, path: String): WatchState = {
    val row = spark.read.option("multiLine", true).json(path)
      .select(col("timestamp"), col("releases"))
      .collect().head
    WatchState(row.getString(0), row.getSeq[String](1))
  }

  /** JSON state checkpoint (write, overwrite-in-place). */
  def writeState(spark: SparkSession, state: WatchState, path: String): Unit = {
    import spark.implicits._
    Seq((state.timestamp, state.releases)).toDF("timestamp", "releases")
      .coalesce(1).write.mode("overwrite").json(path)
  }

  /** One poll step: diff, validate, emit per-release execution inputs
    * (upper-cased keys, invoke_pipeline/app.py:95-107). */
  def poll(
      spark: SparkSession,
      branchNames: Seq[String],
      state: WatchState,
      align: Boolean = false,
      kir: Boolean = false,
      limit: Option[Int] = None): (Seq[Map[String, String]], WatchState) = {
    val fresh = newReleases(spark, branchNames, state.releases)
    val updated = (state.releases ++ fresh).distinct.sortBy(_.toInt)
    require(validateConsecutive(spark, updated),
      s"non-consecutive release sequence: $updated")
    val inputs = fresh.map(r => Map(
      "RELEASES" -> r,
      "ALIGN" -> align.toString,
      "KIR" -> kir.toString,
      "LIMIT" -> limit.map(_.toString).getOrElse("")))
    (inputs, state.copy(releases = updated))
  }
}
