package graft.streaming

import org.apache.spark.sql.SparkSession

/** The exclusive-commit ARBITER contract: publish `body` at `path`
  * iff `path` does not already exist — exactly one of N concurrent
  * publishers succeeds, every loser throws
  * `java.util.ConcurrentModificationException`, and a reader must
  * never observe a half-written body under the winning name (or, at
  * minimum, the name-wins-first degraded guarantee
  * [[FilesystemArbiter]] documents per scheme).
  *
  * Pluggable because object stores (S3-class) have NO native atomic
  * create-exclusive: a deployment there swaps in an arbiter backed by
  * its external lock (a conditional put, ZooKeeper, a database row —
  * the reference pins MaxConcurrency 1 in the pipeline itself,
  * pipeline.asl.json:153, which is that arbiter) via
  * [[AtomicCommit.setArbiter]], without touching any of the store's
  * commit call sites. */
private[graft] trait CommitArbiter {
  def publishExclusive(spark: SparkSession, path: String,
      body: String): Unit
}

/** The ONE atomic exclusive-commit primitive for every single-writer
  * control file the stores keep — GraphStore's version claims,
  * manifest commits, and release markers all publish through here
  * (via [[EventStreams.writeSmallFileExclusive]]), so a future
  * exclusive-commit call site cannot re-introduce a check-then-act
  * window by reaching for `fs.create` directly. Routes to the
  * installed [[CommitArbiter]] — [[FilesystemArbiter]] by default.
  *
  * Loss surfaces as `java.util.ConcurrentModificationException`
  * naming the path and the remedy, the contract
  * [[graft.graph.GraphStore]] wraps with store-specific advice.
  */
private[graft] object AtomicCommit {

  /** The process-wide arbiter every store commit routes through —
    * [[FilesystemArbiter]] (link/O_EXCL) unless a deployment plugged
    * an external one. Swap BEFORE any store writes; the stores read
    * it per commit. */
  @volatile private var current: CommitArbiter = FilesystemArbiter

  def setArbiter(a: CommitArbiter): Unit = { current = a }
  def arbiter: CommitArbiter = current

  /** Publish `body` at `path` if and only if `path` does not already
    * exist — via the installed arbiter. Exactly one of N concurrent
    * publishers succeeds; every loser throws
    * ConcurrentModificationException. */
  def publishExclusive(
      spark: SparkSession, path: String, body: String): Unit =
    current.publishExclusive(spark, path, body)
}

/** The default [[CommitArbiter]].
  *
  * Why this exists: Hadoop's `fs.create(path, overwrite = false)` is
  * only atomic where the FILESYSTEM makes it so. HDFS enforces the
  * exclusivity server-side inside the namenode; RawLocalFileSystem
  * implements it as an `exists()` check followed by a create — a
  * TOCTOU window in which two genuinely concurrent claimers can BOTH
  * win a GraphStore version claim and then interleave bucket writes
  * into the same version directory, exactly the silent lost-update
  * the claim protocol exists to make loud (observed: a concurrent-
  * appliers race losing with `TASK_WRITE_FAILED` on a shared
  * `_temporary` staging dir — both appliers past the claim).
  *
  * Per-scheme commit path:
  *
  *  - `file:` — write the full body to a uniquely-named temp file in
  *    the target's directory, then publish with
  *    `java.nio.file.Files.createLink(target, tmp)`: POSIX `link(2)`
  *    is atomic and fails with `EEXIST` when the target exists, so
  *    exactly one concurrent publisher wins AND the winner's content
  *    is complete the instant the name appears (no reader can observe
  *    a half-written manifest). The plain `Files.createFile` O_EXCL
  *    create would be atomic on the NAME but not on the CONTENT —
  *    which is exactly the degraded-but-still-exclusive fallback used
  *    when the mount has no hard links (FUSE/SSHFS/FAT-class throw
  *    from createLink): one winner guaranteed, content follows.
  *  - everything else — `fs.create(path, overwrite = false)`, atomic
  *    on HDFS (namenode-arbitrated). CAVEAT, documented not hidden:
  *    S3-style object stores have no atomic create-exclusive at all;
  *    a multi-writer deployment there plugs an external
  *    [[CommitArbiter]] instead (see the trait doc). Single-writer
  *    correctness is unaffected on any store.
  */
private[graft] object FilesystemArbiter extends CommitArbiter {

  def publishExclusive(
      spark: SparkSession, path: String, body: String): Unit = {
    val (fs, p0) = EventStreams.hadoopFs(spark, path)
    val p = fs.makeQualified(p0)
    def lost(cause: Throwable): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"commit of $path lost the race: the file already exists, " +
          "so a concurrent writer published this version first — " +
          "re-read the latest committed state and retry the apply", cause)
    if (p.toUri.getScheme == "file") {
      import java.nio.file.{Files, Paths, FileAlreadyExistsException}
      val target = Paths.get(p.toUri)
      Files.createDirectories(target.getParent)
      // Fallback for `file:` mounts WITHOUT hard links (FUSE/SSHFS/
      // FAT-class): O_EXCL create is still atomic on the NAME —
      // exactly one winner — with the content following in a separate
      // write, the same guarantee level as the HDFS branch below.
      // (Forceable via -Dgraft.atomiccommit.nolink=true so the spec
      // can hammer this path too.)
      def noLinkFallback(): Unit = {
        try Files.createFile(target)
        catch { case e: FileAlreadyExistsException => lost(e) }
        Files.write(target, body.getBytes("UTF-8"))
        ()
      }
      if (sys.props.get("graft.atomiccommit.nolink").contains("true"))
        noLinkFallback()
      else {
        val tmp = target.resolveSibling(
          s".${target.getFileName}.tmp-${java.util.UUID.randomUUID()}")
        Files.write(tmp, body.getBytes("UTF-8"))
        try Files.createLink(target, tmp)
        catch {
          case e: FileAlreadyExistsException => lost(e)
          case _: UnsupportedOperationException => noLinkFallback()
          case _: java.nio.file.FileSystemException => noLinkFallback()
        }
        finally Files.deleteIfExists(tmp)
      }
    } else {
      val out =
        try fs.create(p, false)
        catch { case e: java.io.IOException => lost(e) }
      try out.write(body.getBytes("UTF-8"))
      finally out.close()
    }
  }
}
