package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dataDir) memoization of the engine's shared cached
  * tables (shingle/signature/positional indexes, normalized vectors,
  * trained ANN indexes) — WITH an explicit lifecycle.
  *
  * The memos exist because at scale these tables are written once and
  * served to every downstream consumer; rebuilding a corpus index per
  * query would re-shuffle the corpus each time. But a long-lived
  * session that walks many corpus dirs must also be able to let one
  * go: `Memo.evict(spark, dir)` unpersists and drops every memoized
  * table built from `dir`, and `Memo.clear(spark)` resets the
  * session's whole memo set — without touching other dirs' cached
  * plans and without the caller reaching for
  * `spark.catalog.clearCache()` (which would blow away every cached
  * table in the session, theirs included).
  *
  * Session keys are weak, but weakness alone does not make a stopped
  * session collectable: the map VALUES are DataFrames, which hold
  * their SparkSession, and the WeakHashMap contract says a value
  * that (transitively) references its own key pins the entry. So the
  * first memo built for a session also registers a context
  * application-end hook that DROPS that session's per-table maps
  * outright — no unpersist (the session's storage died with the
  * session), just releasing the plan objects so the session can be
  * collected. The hook fires when the CONTEXT stops; a discarded
  * `spark.newSession()` clone sharing a live context is not freed by
  * it — release those explicitly with `Memo.clear(clone)` when the
  * clone is retired.
  */
object Memo {
  private val registry =
    new java.util.ArrayList[Table[_]]()

  private val hooked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def hook(s: SparkSession): Unit =
    if (hooked.put(s, java.lang.Boolean.TRUE) == null) {
      // The listener must not strongly hold the session (that would
      // recreate the leak it exists to fix) — weak-ref it.
      val ref = new java.lang.ref.WeakReference(s)
      try s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler
                .SparkListenerApplicationEnd): Unit = {
            val sess = ref.get()
            if (sess != null) tables.foreach(_.drop(sess))
          }
        })
      catch { case _: IllegalStateException => () } // already stopped
    }

  /** One memo table: a value built once per (session, dataDir) and
    * unpersisted when evicted. */
  final class Table[V] private[Memo] (unpersistValue: V => Unit) {
    private val cache = java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        scala.collection.mutable.Map[String, V]]())

    private def perSession(s: SparkSession) = cache.synchronized {
      var m = cache.get(s)
      if (m == null) {
        m = scala.collection.mutable.Map.empty[String, V]
        cache.put(s, m)
      }
      m
    }

    def apply(s: SparkSession, d: String)(build: => V): V = {
      hook(s)
      val m = perSession(s)
      m.synchronized(m.getOrElseUpdate(d, build))
    }

    /** Forget the session's map without unpersisting — the
      * application-end path, where the executors are already gone. */
    private[Memo] def drop(s: SparkSession): Unit = {
      cache.remove(s); ()
    }

    private[Memo] def evict(s: SparkSession, d: String): Unit = {
      val m = perSession(s)
      m.synchronized(m.remove(d)).foreach(unpersistValue)
    }

    private[Memo] def clear(s: SparkSession): Unit = {
      val m = perSession(s)
      val vs = m.synchronized { val v = m.values.toList; m.clear(); v }
      vs.foreach(unpersistValue)
    }
  }

  def table[V](unpersist: V => Unit): Table[V] = {
    val t = new Table[V](unpersist)
    registry.synchronized { registry.add(t); () }
    t
  }

  /** The common case: a single cached DataFrame per (session, dir). */
  def dfTable: Table[DataFrame] = table(df => { df.unpersist(); () })

  /** A cached DataFrame pair (e.g. a trained index's assignment +
    * centroid tables). */
  def dfPairTable: Table[(DataFrame, DataFrame)] =
    table { case (a, b) => a.unpersist(); b.unpersist(); () }

  private def tables: List[Table[_]] =
    registry.synchronized {
      scala.jdk.CollectionConverters.ListHasAsScala(registry).asScala.toList
    }

  /** Unpersist + drop every memoized table built from `dataDir` in
    * session `s`; other dirs' memos are untouched. */
  def evict(s: SparkSession, dataDir: String): Unit =
    tables.foreach(_.evict(s, dataDir))

  /** Unpersist + drop ALL of session `s`'s memoized tables. */
  def clear(s: SparkSession): Unit =
    tables.foreach(_.clear(s))
}
