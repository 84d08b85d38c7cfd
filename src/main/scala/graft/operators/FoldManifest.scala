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

  /** None on ANY malformed content — missing terminator, count
    * mismatch, non-numeric bytes, empty coverage: all mean the arming
    * write never became fully durable, and the stage must be treated
    * as torn, never completed against a guessed coverage set. */
  def read(fs: FileSystem, sp: Path): Option[Set[Long]] =
    scala.util.Try {
      val in = fs.open(path(sp))
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      require(lines.length >= 3 && lines.last == "END")
      val ids = lines.slice(1, lines.length - 1).map(_.toLong).toSet
      require(ids.size == lines.head.toInt && ids.nonEmpty)
      ids
    }.toOption
}
