package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Staged-compaction coverage manifest, shared by every persisted store
  * that folds ingest partitions in place (the ANN index's per-ingest
  * artifacts, the incremental-dedup band store).
  *
  * A fold stages its merged output in a dot-dir, then commits a
  * `_FOLDED` manifest naming EXACTLY the partition ids the stage
  * covers. Only after the manifest lands may originals be deleted — so
  * recovery can distinguish "crash while staging, nothing touched"
  * (manifest missing/torn → discard the stage) from "crash mid-swap"
  * (manifest present → delete exactly the manifest's partitions and
  * rename the stage in). Deleting by manifest rather than by
  * `id <= target` keeps a partition that was uncommitted at stage time
  * — and therefore excluded from the fold — intact through a crashed
  * swap: a target-scoped delete would destroy its replayed commit
  * unrecoverably.
  *
  * Wire format: `<count>` then one id per line then `END`. Count +
  * terminator make TRUNCATION detectable — a partially persisted
  * manifest whose surviving prefix still parses as ids would otherwise
  * make recovery delete partitions the stage does not cover. The file
  * is underscore-prefixed, so parquet directory listings skip it and it
  * rides through the swap into the live partition dir harmlessly.
  */
object FoldManifest {
  def path(sp: Path): Path = new Path(sp, "_FOLDED")

  /** Commit the manifest by rename so it appears atomically. hsync is
    * asked for (best-effort: the local ChecksumFileSystem silently
    * degrades it to a flush), but the format check, not the sync, is
    * what the committed branch trusts. */
  def write(fs: FileSystem, sp: Path, tags: Seq[Long]): Unit = {
    val tmp = new Path(sp, "._folded_tmp")
    val out = fs.create(tmp, true)
    try {
      val body = (tags.size.toString +: tags.map(_.toString)) :+ "END"
      out.write(body.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try out.hsync() catch { case _: UnsupportedOperationException => out.hflush() }
    } finally out.close()
    require(fs.rename(tmp, path(sp)), s"failed to commit fold manifest under $sp")
  }

  /** The three evidentiary states recovery can act on. The distinction
    * between Absent and Unreadable is LOAD-BEARING: an absent manifest
    * proves arming never happened (commit is by atomic rename), so the
    * covered originals are intact; an existing-but-malformed manifest
    * means arming DID commit and storage mangled the bytes after — the
    * deletes may have run, and treating it as "never armed" would
    * authorize discarding the only copy of folded history. Transient
    * IO failures (a flaky open/read on remote storage) fit neither
    * state and PROPAGATE — recovery must retry, not decide on a
    * misread. */
  sealed trait State
  case object Absent extends State
  case object Unreadable extends State
  final case class Covered(ids: Set[Long]) extends State

  def state(fs: FileSystem, sp: Path): State = {
    val mp = path(sp)
    if (!fs.exists(mp)) Absent // FNF only: other IO errors propagate
    else {
      // the read itself may throw (transient storage error) — let it;
      // only CONTENT problems downgrade to Unreadable
      val in = fs.open(mp)
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      parse(lines).fold[State](Unreadable)(Covered)
    }
  }

  /** None on ANY malformed content — missing terminator, count
    * mismatch, non-numeric bytes, empty coverage: the truncation-
    * detectable format means a surviving prefix can never pass as a
    * smaller coverage set. */
  private def parse(lines: List[String]): Option[Set[Long]] =
    scala.util.Try {
      require(lines.length >= 3 && lines.last == "END")
      val ids = lines.slice(1, lines.length - 1).map(_.toLong).toSet
      require(ids.size == lines.head.toInt && ids.nonEmpty)
      ids
    }.toOption

  /** Covered ids, or None for Absent OR Unreadable — callers that need
    * to tell those apart (the band store's unattended auto-discard)
    * must use `state`. Transient IO errors propagate here too. */
  def read(fs: FileSystem, sp: Path): Option[Set[Long]] =
    state(fs, sp) match {
      case Covered(ids) => Some(ids)
      case _ => None
    }
}
