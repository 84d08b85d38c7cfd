package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-stamped single-writer lease for STORE MAINTAINERS — the
  * file-granularity analog of the reference's coordinator lease
  * (reference: pspf/cluster/coordinator.py:126-151, lease acquire /
  * TTL expiry / takeover). Every mutating maintenance pass over a
  * persisted store (blob append/vacuum, ANN ingest/compaction/delete/
  * rebuild, dedup band-store compaction, sidecar refresh) documents a
  * single-writer contract; this makes the contract ENFORCED: a second
  * concurrent maintainer fails loudly at acquire, and a maintainer
  * whose lease was taken over mid-run (it stalled past the TTL) fails
  * loudly at `verify` BEFORE its commit point instead of racing the
  * new owner's renames — the double-vacuum race that would otherwise
  * lose bytes silently despite each process's own crash recovery
  * being sound.
  *
  * Mechanics: the lease is one file BESIDE the store (`<store>.lease`
  * — outside it, because vacuum/compaction rename the store dir
  * whole), created with overwrite=false (atomic create-if-absent on
  * local/HDFS), carrying owner, generation, nonce, acquire time and
  * TTL. Acquire fails while an unexpired lease stands; an EXPIRED
  * lease is taken over loudly with the generation bumped, so the
  * stalled holder's `verify` (nonce mismatch) can never pass again.
  * A crashed holder leaves its lease to expire — TTL is the liveness
  * mechanism, exactly as in the reference; size it to bound the
  * maintenance window, not the job.
  *
  * What this is NOT: a distributed lock service. Create-if-absent on
  * a real object store has weaker atomicity than HDFS; the lease is a
  * loud-failure guard for operational races (two humans, a cron and a
  * human), not a correctness substrate — the stores' own staged-swap
  * commit protocols remain the source of crash safety. */
object StoreLease {

  /** A held lease. `nonce` is the verify token: takeover rewrites it,
    * so a stale holder can never pass `verify` again. */
  final case class Held(storePath: String, owner: String,
                        generation: Long, nonce: String)

  /** Expiry is judged by the READER's clock against `acquiredAtMs`
    * written by a possibly different host, so cross-host clock skew
    * eats into (or extends) the effective TTL: a reader whose clock
    * runs ahead by more than the remaining TTL will take over a live,
    * healthy maintainer — whose in-flight work is then aborted at
    * verify rather than never started (loud, not lost, but wasted).
    * Size TTLs with a skew margin: DefaultTtlMs assumes NTP-grade
    * skew (seconds) against a 15-minute window; under worse skew,
    * grow the TTL so skew stays a small fraction of it. */
  val DefaultTtlMs: Long = 15L * 60 * 1000

  def leasePath(storePath: String): String = s"$storePath.lease"

  private def fsFor(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def readFields(fs: FileSystem, p: Path): Option[Map[String, String]] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        Some(txt.trim.split('\n').map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v }.toMap)
      } finally in.close()
    }

  private def writeFields(fs: FileSystem, p: Path,
                          fields: Map[String, String]): Unit = {
    // overwrite=false: create-if-absent is the acquire's atomicity
    val out = fs.create(p, false)
    try out.write(fields.map { case (k, v) => s"$k=$v" }.mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Acquire the maintenance lease for `storePath`, failing LOUDLY if
    * an unexpired lease stands (naming the holder — the operator
    * decides whether to wait or raise the alarm, the code never
    * silently proceeds). An expired lease is taken over with a loud
    * log line and a bumped generation. */
  def acquire(spark: SparkSession, storePath: String, owner: String,
              ttlMs: Long = DefaultTtlMs): Held = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val fs = fsFor(spark, storePath)
    val p = new Path(leasePath(storePath))
    val nonce = java.util.UUID.randomUUID().toString
    val (gen, takeover) = readFields(fs, p) match {
      case Some(f) =>
        val ageMs = System.currentTimeMillis() -
          f.getOrElse("acquiredAtMs", "0").toLong
        val heldTtl = f.getOrElse("ttlMs", "0").toLong
        require(ageMs > heldTtl,
          s"store $storePath is under maintenance by " +
            s"'${f.getOrElse("owner", "?")}' (generation " +
            s"${f.getOrElse("generation", "?")}, held ${ageMs} ms of " +
            s"${heldTtl} ms TTL) — refusing a second concurrent " +
            "maintainer; wait for release/expiry or remove " +
            s"${leasePath(storePath)} if the holder is known dead")
        // Takeover atomicity: the expired lease is removed by RENAMING
        // it to a tombstone unique to this acquire. rename's source-
        // must-exist semantics mean exactly ONE of two racing takeovers
        // wins; the loser fails loudly HERE instead of blindly deleting
        // the winner's freshly created lease (the delete-then-create
        // interleave that could mint two concurrent holders).
        val tomb = new Path(s"${leasePath(storePath)}.expired.$nonce")
        require(fs.rename(p, tomb),
          s"lost the expired-lease takeover race for $storePath — " +
            "another maintainer claimed the expired lease concurrently")
        // Steal check: rename moves WHATEVER stands at the lease path.
        // If a faster takeover already replaced the expired lease with
        // its own fresh one, the rename just moved a LIVE lease aside —
        // content is the truth: the tombstone must still carry the
        // expired lease's nonce. On mismatch, put the displaced lease
        // back (only if nothing re-occupied the path — never clobber a
        // third acquirer) and lose loudly; the displaced holder aborts
        // at verify if we were too late to restore.
        val tombFields = readFields(fs, tomb)
        if (!tombFields.exists(_.get("nonce") == f.get("nonce"))) {
          if (fs.exists(p)) fs.delete(tomb, false): Unit
          else fs.rename(tomb, p): Unit
          throw new IllegalStateException(
            s"lost the expired-lease takeover race for $storePath — a " +
              "concurrent maintainer re-acquired before our takeover; " +
              "its lease was restored")
        }
        fs.delete(tomb, false): Unit
        (f.getOrElse("generation", "0").toLong + 1, Some(f.getOrElse("owner", "?")))
      case None => (1L, None)
    }
    takeover.foreach(prev => System.err.println(
      s"[StoreLease] taking over EXPIRED lease on $storePath from " +
        s"'$prev' as '$owner' (generation $gen) — the previous " +
        "maintainer stalled past its TTL; its commit will be refused"))
    try writeFields(fs, p, Map(
      "owner" -> owner, "generation" -> gen.toString, "nonce" -> nonce,
      "acquiredAtMs" -> System.currentTimeMillis().toString,
      "ttlMs" -> ttlMs.toString))
    catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"lost the acquire race for $storePath — another maintainer " +
          s"created ${leasePath(storePath)} concurrently", e)
    }
    // Create-then-confirm: local/posix create(overwrite=false) is
    // check-then-act rather than truly atomic, so re-read the lease and
    // require it still carries THIS acquire's nonce before reporting
    // Held — a racer that slipped between the check and the write is
    // detected here, and exactly one contender can confirm.
    require(readFields(fs, p).exists(_.get("nonce").contains(nonce)),
      s"lost the acquire race for $storePath — another maintainer's " +
        s"lease stands at ${leasePath(storePath)} after our create")
    Held(storePath, owner, gen, nonce)
  }

  /** Verify-on-commit: call immediately BEFORE the critical mutation
    * (the rename swap, the artifact overwrite). Fails loudly if the
    * lease no longer carries our nonce — i.e. we stalled past the TTL
    * and another maintainer took over; committing now would race its
    * writes. */
  def verify(spark: SparkSession, h: Held): Unit = {
    val fs = fsFor(spark, h.storePath)
    val f = readFields(fs, new Path(leasePath(h.storePath)))
    require(f.exists(_.get("nonce").contains(h.nonce)),
      s"lease on ${h.storePath} held by '${h.owner}' (generation " +
        s"${h.generation}) was " +
        f.map(g => s"taken over by '${g.getOrElse("owner", "?")}' " +
          s"(generation ${g.getOrElse("generation", "?")})")
          .getOrElse("released/removed") +
        " — aborting this commit instead of racing the new maintainer")
  }

  /** Release: delete the lease if it is still ours (a taken-over lease
    * belongs to the new owner — leave it). */
  def release(spark: SparkSession, h: Held): Unit = {
    val fs = fsFor(spark, h.storePath)
    val p = new Path(leasePath(h.storePath))
    if (readFields(fs, p).exists(_.get("nonce").contains(h.nonce)))
      fs.delete(p, false): Unit
  }

  /** Operator-readable lease state — the `ctl lease-status` view.
    * `expired` is the takeover-eligibility verdict computed with the
    * same arithmetic `acquire` uses, so what this reports as expired
    * is exactly what an acquire would take over. */
  final case class Status(owner: String, generation: Long, heldMs: Long,
                          ttlMs: Long, expired: Boolean)

  /** Inspect the standing lease on `storePath`, if any. Read-only. */
  def status(spark: SparkSession, storePath: String): Option[Status] = {
    val fs = fsFor(spark, storePath)
    readFields(fs, new Path(leasePath(storePath))).map { f =>
      val heldMs = System.currentTimeMillis() -
        f.getOrElse("acquiredAtMs", "0").toLong
      val ttl = f.getOrElse("ttlMs", "0").toLong
      Status(f.getOrElse("owner", "?"),
        f.getOrElse("generation", "0").toLong, heldMs, ttl, heldMs > ttl)
    }
  }

  /** Operationally break a lease: an EXPIRED lease is removed silently
    * (the holder is dead by the TTL contract); a LIVE lease is refused
    * unless `force` — forcing is the "the holder is known dead but its
    * TTL hasn't run out" incident path the acquire error message points
    * at, and it logs loudly because the broken holder's verify-on-
    * commit will now fail by design. Returns a printable verdict. */
  def breakLease(spark: SparkSession, storePath: String,
                 force: Boolean = false): String = {
    val fs = fsFor(spark, storePath)
    val p = new Path(leasePath(storePath))
    status(spark, storePath) match {
      case None => s"no lease standing on $storePath"
      case Some(st) =>
        require(st.expired || force,
          s"lease on $storePath is LIVE: held by '${st.owner}' " +
            s"(generation ${st.generation}, ${st.heldMs} ms of " +
            s"${st.ttlMs} ms TTL) — refusing to break a live lease " +
            "without --force")
        if (!st.expired) System.err.println(
          s"[StoreLease] FORCE-breaking live lease on $storePath held " +
            s"by '${st.owner}' (generation ${st.generation}) — its " +
            "commit will be refused at verify")
        require(fs.delete(p, false), s"failed to delete ${leasePath(storePath)}")
        s"broke ${if (st.expired) "expired" else "LIVE"} lease of " +
          s"'${st.owner}' (generation ${st.generation})"
    }
  }

  /** Run `body` under the lease: acquire → body (which should call
    * `verify` right before its commit point) → release. On failure the
    * lease is still released if it remains ours — a crashed JVM leaves
    * it to TTL expiry instead. */
  def withLease[T](spark: SparkSession, storePath: String, owner: String,
                   ttlMs: Long = DefaultTtlMs)(body: Held => T): T = {
    val h = acquire(spark, storePath, owner, ttlMs)
    try body(h) finally release(spark, h)
  }
}
