package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.watch.ReleaseWatch

class ReleaseWatchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("release-shaped branch filter (regex ^\\d{2,3}0$)") {
    assert(ReleaseWatch.isReleaseShaped("3560"))
    assert(ReleaseWatch.isReleaseShaped("300"))
    assert(!ReleaseWatch.isReleaseShaped("3561"))
    assert(!ReleaseWatch.isReleaseShaped("Latest"))
    assert(!ReleaseWatch.isReleaseShaped("35600"))
  }

  test("new-release detection is a left-anti set difference (O1)") {
    val fresh = ReleaseWatch.newReleases(spark,
      Seq("3550", "3560", "3570", "feature-branch"),
      Seq("3550", "3560"))
    assert(fresh == Seq("3570"))
    assert(ReleaseWatch.newReleases(spark, Seq("3550"), Seq("3550")).isEmpty)
  }

  test("consecutive-by-10 validation (np.diff semantics)") {
    assert(ReleaseWatch.validateConsecutive(spark, Seq("3540", "3550", "3560")))
    assert(!ReleaseWatch.validateConsecutive(spark, Seq("3540", "3560")))
    assert(ReleaseWatch.validateConsecutive(spark, Seq("3560")))
  }

  test("poll: diff -> validate -> execution inputs + updated state") {
    val st = ReleaseWatch.WatchState("2026-01-01T00:00:00",
      Seq("3540", "3550"))
    val (inputs, next) = ReleaseWatch.poll(spark,
      Seq("3540", "3550", "3560", "junk"), st, align = true)
    assert(inputs == Seq(Map(
      "RELEASES" -> "3560", "ALIGN" -> "true", "KIR" -> "false",
      "LIMIT" -> "")))
    assert(next.releases == Seq("3540", "3550", "3560"))
  }

  test("state JSON checkpoint round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("watch").toString + "/state"
    val st = ReleaseWatch.WatchState("2026-02-02T00:00:00", Seq("3550", "3560"))
    ReleaseWatch.writeState(spark, st, dir)
    val back = ReleaseWatch.readState(spark, dir)
    assert(back.timestamp == st.timestamp)
    assert(back.releases.sorted == st.releases.sorted)
  }
}
