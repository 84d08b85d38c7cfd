package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Registry for the scratch state self-contained graded queries create:
  * l61/l62/l64/l65/l66 build persisted stores under temp dirs, and
  * runTws parks streaming output in a memory-sink view the returned
  * frame reads lazily — neither can be reclaimed at create time.
  * Short-lived Verify/Bench sessions get cleanup for free from the JVM
  * shutdown hook; a long-lived session calls `purge` (Ctl verb
  * `scratch purge`) once it is done with the returned frames, so /tmp
  * and the temp-view catalog don't accumulate across pipelines. */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val views = new java.util.concurrent.ConcurrentLinkedQueue[String]()

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
    * must be re-run, exactly like any other freed resource. */
  def purge(spark: SparkSession): (Int, Int) = {
    var nv = 0
    var v = views.poll()
    while (v != null) {
      if (spark.catalog.tableExists(v)) spark.catalog.dropTempView(v)
      nv += 1
      v = views.poll()
    }
    (deleteDirs(), nv)
  }

  private def deleteDirs(): Int = {
    var n = 0
    var d = dirs.poll()
    while (d != null) {
      // best-effort: at JVM exit Spark's own shutdown hooks race this
      // one over streaming checkpoints — either order's deletes land
      try delete(d) catch { case _: java.io.IOException => () }
      n += 1
      d = dirs.poll()
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
