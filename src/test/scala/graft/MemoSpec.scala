package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{DedupTestAccess, Memo, SimilarityTestAccess}

/** Lifecycle of the per-(session, dataDir) memoized engine tables:
  * a long-lived session walking many corpus dirs must be able to
  * release one dir's cached indexes without nuking the others (and
  * without knowing about `spark.catalog.clearCache()`). */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    graft.functions.NativeFunctions.register(s)
    s
  }
  private val d1 = "/root/testdata/sf0.001"
  private val d2 = "/root/testdata/sf0.01"

  test("evict(dir) unpersists that dir's memos; other dirs stay cached") {
    val a1 = DedupTestAccess.simhash(spark, d1)
    val a2 = DedupTestAccess.simhash(spark, d2)
    a1.count(); a2.count()
    assert(a1.storageLevel != StorageLevel.NONE)
    assert(a2.storageLevel != StorageLevel.NONE)

    Memo.evict(spark, d1)

    // evicted dir: its cached table is unpersisted (executor storage
    // released) and a re-request rebuilds from scratch
    assert(a1.storageLevel == StorageLevel.NONE,
      "evicted memo must be unpersisted")
    val rebuilt = DedupTestAccess.simhash(spark, d1)
    assert(!(rebuilt eq a1), "evicted memo must rebuild, not resurrect")

    // untouched dir: still cached, and the memo still serves the SAME
    // instance, whose executed plan reuses the in-memory relation
    assert(a2.storageLevel != StorageLevel.NONE,
      "other dirs' memos must survive an evict")
    assert(DedupTestAccess.simhash(spark, d2) eq a2)
    assert(a2.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"),
      "kept memo must serve from the in-memory relation")
    Memo.evict(spark, d1) // leave no half-registered state behind
  }

  test("evict covers every memo family for the dir, incl. index pairs") {
    val pos = DedupTestAccess.shingleStorage(spark, d1)
    val vecs = SimilarityTestAccess.vecs(spark, d1)
    val (assign, cents) = SimilarityTestAccess.kmeansIndex(spark, d1)
    Seq(pos, vecs, assign, cents).foreach(_.count())
    Seq(pos, vecs, assign, cents)
      .foreach(df => assert(df.storageLevel != StorageLevel.NONE))
    Memo.evict(spark, d1)
    Seq(pos, vecs, assign, cents).foreach(df =>
      assert(df.storageLevel == StorageLevel.NONE,
        "every memo family must release its storage on evict"))
  }

  test("clear(session) drops the whole memo set") {
    val a1 = DedupTestAccess.simhash(spark, d1)
    val a2 = DedupTestAccess.simhash(spark, d2)
    a1.count(); a2.count()
    Memo.clear(spark)
    assert(a1.storageLevel == StorageLevel.NONE)
    assert(a2.storageLevel == StorageLevel.NONE)
  }
}
