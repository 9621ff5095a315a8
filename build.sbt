ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gfedbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forward the forked program's stdout/stderr verbatim (no sbt [info]
// prefixes) so line-oriented consumers (the driver's bench-JSON parse)
// see e.g. Bench's single JSON line bare on stdout.
run / outputStrategy := Some(StdoutOutput)
// Drop the trailing "[success] Total time: …" line: the driver
// recovers Bench's JSON from the tail of the captured output, and
// every char printed after the JSON line shrinks what remains of it.
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Default heap scales with host RAM (~1/4 of physical, floored at 4g,
// capped at 28g) so the build runs anywhere: the 128 GiB bench host
// still gets the 28g the 79-query bench needs (at 8g the unified-memory
// storage pool was 4.6 GiB and the suite evicted the shared derived-
// table caches mid-run), while a 16 GiB dev box gets 4g instead of a
// JVM that fails to start. SPARK_DRIVER_MEM overrides.
val defaultDriverHeap: String = {
  val physGib: Long =
    try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal") =>
          l.replaceAll("[^0-9]", "").toLong }.getOrElse(0L)
      kb / (1024L * 1024L)
    } catch { case scala.util.control.NonFatal(_) => 0L }
  val gib = if (physGib <= 0) 8L else math.max(4L, math.min(28L, physGib / 4))
  s"${gib}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultDriverHeap)}",
)
