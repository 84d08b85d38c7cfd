package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Registry for the scratch state self-contained graded queries create:
  * l61/l62/l64/l65/l66 build persisted stores under temp dirs, and
  * runTws parks streaming output in a memory-sink view the returned
  * frame reads lazily — neither can be reclaimed at create time.
  * Short-lived Verify/Bench sessions get cleanup for free from the JVM
  * shutdown hook; a long-lived session calls `Scratch.purge(spark)`
  * IN-PROCESS once it is done with the returned frames, so /tmp and
  * the temp-view catalog don't accumulate across pipelines. (The
  * registry is JVM-local by nature — an external CLI process could
  * never see this session's registrations, which is why there is
  * deliberately no Ctl verb for it.) */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val views = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  // The exit hook reclaims DIRS only, deliberately: registered temp
  // views live in a SparkSession catalog, and at JVM exit that catalog
  // dies with the process — dropping them here would be a no-op racing
  // Spark's own shutdown. Views leak only within a LIVE long session,
  // which is exactly what the in-process `purge` call is for.
  Runtime.getRuntime.addShutdownHook(new Thread(() => { deleteDirs(); () }))

  /** A registered scratch directory: reclaimed at JVM exit, or earlier
    * by an explicit purge. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Register a memory-sink view name for purge-time drop. */
  def view(name: String): String = { views.add(name); name }

  /** Drop every registered memory-sink view and delete every registered
    * dir; returns (dirs deleted, views dropped). Only for callers that
    * know no returned frame still reads them — a purged query's frame
    * must be re-run, exactly like any other freed resource. A dir whose
    * delete fails (e.g. a file handle still pinned) STAYS REGISTERED
    * and is not counted, so a later purge or the exit hook retries it
    * instead of leaking it forever behind a success count. */
  def purge(spark: SparkSession): (Int, Int) = {
    var nv = 0
    var v = views.poll()
    while (v != null) {
      // counted only when a drop actually ran — a name registered but
      // never materialized (or already dropped) is deregistration, not
      // reclamation, and must not inflate the reported count
      if (spark.catalog.tableExists(v)) { spark.catalog.dropTempView(v); nv += 1 }
      v = views.poll()
    }
    (deleteDirs(), nv)
  }

  private def deleteDirs(): Int = {
    var n = 0
    // bounded by the queue size at entry: a failed dir is re-enqueued
    // for the NEXT purge/exit attempt, not retried in this loop
    var remaining = dirs.size()
    var d = dirs.poll()
    while (d != null && remaining > 0) {
      // best-effort: at JVM exit Spark's own shutdown hooks race this
      // one over streaming checkpoints — a concurrent delete surfaces
      // as UncheckedIOException/DirectoryIteratorException from the
      // directory stream, not just IOException, so catch NonFatal or
      // the hook thread dies mid-queue and leaks the rest
      val failure = try { delete(d); None }
        catch { case scala.util.control.NonFatal(e) => Some(e) }
      // gone-on-disk is the success criterion, however it got gone (a
      // racing Spark hook deleting it out from under us counts) — BUT
      // Files.exists also answers false on an access error, so a delete
      // that threw AND "doesn't exist" is ambiguous: count it (nothing
      // more we can do) yet say so, instead of silently reporting a dir
      // we may never have reclaimed as a success
      if (!Files.exists(d)) {
        failure.foreach(e => System.err.println(
          s"[scratch] $d: delete threw ${e.getClass.getSimpleName} but the dir " +
            "no longer answers exists() — counted as reclaimed, verify manually " +
            "if the path was on flaky storage"))
        n += 1
      } else dirs.add(d)
      remaining -= 1
      d = if (remaining > 0) dirs.poll() else null
    }
    n
  }

  private def delete(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(delete(_)) finally children.close()
    }
    Files.deleteIfExists(p): Unit
  }
}
