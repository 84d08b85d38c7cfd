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
  * Mechanics — generation-numbered, NEVER-MOVED lease files. The lease
  * for generation g is one file `<store>.lease.<g>` BESIDE the store
  * (outside it, because vacuum/compaction rename the store dir whole),
  * carrying owner, nonce, acquire time and TTL. Acquire lists the
  * standing generations and targets max+1 with an atomic
  * create-if-absent (O_CREAT|O_EXCL via File.createNewFile on the
  * local fs, where Hadoop's create(overwrite=false) is only
  * check-then-act; server-side create-if-absent on HDFS): every
  * contender with a current view races the SAME path and exactly one
  * wins; a contender with a stale view targets an already-existing
  * generation and loses loudly. Acquire REFUSES while the highest
  * generation is live (unexpired, unreleased); an expired one is taken
  * over loudly at the next generation, so the stalled holder's
  * `verify` (highest-generation + nonce check) can never pass again.
  * Release never deletes the contested file — it publishes a
  * `<store>.lease.<g>.released` marker (another atomic create), so no
  * code path ever moves or deletes a file another contender may be
  * arbitrating on; a winner sweeps generations >= 2 behind its own to
  * bound litter. A crashed holder leaves its lease to expire — TTL is
  * the liveness mechanism, exactly as in the reference; size it to
  * bound the maintenance window, not the job.
  *
  * Residual window, documented: a contender whose directory listing is
  * TWO takeover generations stale can re-create a swept low
  * generation and believe it holds an idle store. Generations only
  * advance through TTL expiry or release, so such a contender has
  * stalled across at least one full maintenance cycle — and its
  * `verify` fails (it is not the highest generation), so it can never
  * commit; the guard degrades to wasted work, never to racing writes.
  *
  * What this is NOT: a distributed lock service. Create-if-absent on a
  * real object store has weaker atomicity than HDFS; the lease is a
  * loud-failure guard for operational races (two humans, a cron and a
  * human), not a correctness substrate — the stores' own staged-swap
  * commit protocols remain the source of crash safety. */
object StoreLease {

  /** A held lease. `nonce` is the verify token: takeover supersedes
    * the generation and rewrites the nonce the verify must match, so a
    * stale holder can never pass `verify` again. */
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

  /** The lease-file PREFIX: generation g's file is `<prefix>.<g>`,
    * its release marker `<prefix>.<g>.released`. */
  def leasePath(storePath: String): String = s"$storePath.lease"

  /** Lease-file I/O goes through the RAW local filesystem (no checksum
    * sidecars): the atomic-create path below writes via java.io, and a
    * mixed crc/no-crc history on the same path would poison later
    * checksummed reads. Non-local filesystems pass through untouched. */
  private def fsFor(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf()) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
      case other => other
    }

  private def readFields(fs: FileSystem, p: Path): Option[Map[String, String]] =
    try {
      val in = fs.open(p)
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        Some(txt.trim.split('\n').map(_.split("=", 2))
          .collect { case Array(k, v) => k -> v }.toMap)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  /** Atomic create-if-absent, then content write. File.createNewFile
    * is O_CREAT|O_EXCL on the local fs — exactly one racer creates,
    * every loser throws here and fails its acquire loudly. The content
    * write that follows is not atomic with the creation — readers
    * judge a fields-less lease by its mtime (fresh → live → refuse),
    * never as absent or expired. */
  private def createFile(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit =
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val f = new java.io.File(p.toUri.getPath)
        val parent = f.getParentFile
        if (parent != null) parent.mkdirs(): Unit
        if (!f.createNewFile())
          throw new java.io.IOException(s"$p already exists")
        val out = new java.io.FileOutputStream(f)
        try out.write(bytes) finally out.close()
      case _ =>
        // HDFS create-if-absent is atomic server-side
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
    }

  private def fieldBytes(fields: Map[String, String]): Array[Byte] =
    fields.map { case (k, v) => s"$k=$v" }.mkString("\n").getBytes("UTF-8")

  /** The takeover-eligibility arithmetic shared by `acquire` and
    * `status`: age from `acquiredAtMs`, falling back to the lease
    * FILE's mtime when the field is missing (a racer mid-write between
    * its atomic create and its content write, or a holder that crashed
    * between the two) — fresh mtime reads as live and is refused; a
    * torn file left by a crash expires by mtime like any stall.
    *
    * Asymmetry, stated: a torn lease (missing `ttlMs`) is governed by
    * `DefaultTtlMs` REGARDLESS of the TTL the holder actually
    * requested — a long-TTL holder that crashed mid-write becomes
    * takeover-eligible after only the default (safe: its commit's
    * verify fails, only its in-flight work is wasted), and a short-TTL
    * torn lease blocks takeover for the full default. Acceptable
    * because verify guards the commit either way; the fallback bounds
    * liveness, not safety. */
  private def ageAndTtl(fs: FileSystem, p: Path,
                        f: Map[String, String]): (Long, Long) = {
    val acquiredAt = f.get("acquiredAtMs").map(_.toLong).getOrElse {
      try fs.getFileStatus(p).getModificationTime
      catch { case _: java.io.FileNotFoundException =>
        System.currentTimeMillis() } // vanished mid-read: treat as live
    }
    (System.currentTimeMillis() - acquiredAt,
      f.get("ttlMs").map(_.toLong).getOrElse(DefaultTtlMs))
  }

  /** All standing lease generations (gen → file) and the set of
    * generations with a published release marker.
    *
    * A bare pre-generation `<store>.lease` file (the format this
    * rework replaced) is folded in as generation 0: during a
    * mixed-version window — an old-code maintainer holding the bare
    * file while a new-code maintainer arbitrates — the new acquirer
    * must SEE that holder and refuse/TTL-arbitrate it like any
    * standing lease, or mutual exclusion is silently lost (exactly
    * the two-holder race the generation scheme exists to prevent).
    * The bare file's `generation` field, if present, wins over 0. */
  private def leaseFiles(fs: FileSystem,
                         storePath: String): (Map[Long, Path], Set[Long]) = {
    val prefixPath = new Path(leasePath(storePath))
    val prefix = prefixPath.getName + "."
    val sts =
      try fs.listStatus(prefixPath.getParent)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    val leases = Map.newBuilder[Long, Path]
    val released = Set.newBuilder[Long]
    sts.foreach { st =>
      val n = st.getPath.getName
      // shared parse guard: empty ("generation=" in a torn file) and
      // overlong digit strings both survive a forall(isDigit) check
      // but crash toLong — a torn lease must fall back to generation
      // 0 / be skipped, never wedge arbitration. The bound is a
      // DELIBERATELY conservative 18 digits (every 18-digit value fits
      // a Long; some 19-digit ones overflow): generations here count
      // up by 1 from 0, so a legitimate 19-digit generation cannot
      // occur, and treating one as torn errs on the safe side of the
      // same fold-to-0 contract
      def parsableGen(g: String): Boolean =
        g.nonEmpty && g.length <= 18 && g.forall(_.isDigit)
      if (n == prefixPath.getName) {
        val g = readFields(fs, st.getPath).getOrElse(Map.empty)
          .get("generation").filter(parsableGen)
          .map(_.toLong).getOrElse(0L)
        leases += g -> st.getPath
      } else if (n.startsWith(prefix)) {
        val rest = n.substring(prefix.length)
        if (parsableGen(rest))
          leases += rest.toLong -> st.getPath
        else if (rest.endsWith(".released")) {
          val g = rest.stripSuffix(".released")
          if (parsableGen(g)) released += g.toLong
        }
      }
    }
    (leases.result(), released.result())
  }

  /** Delete lease files and markers of generations <= `uptoGen` — only
    * ever called by a CONFIRMED winner (two generations ahead) or by
    * `breakLease`; never touches the generation any live-view
    * contender could be arbitrating on. */
  private def sweep(fs: FileSystem, storePath: String, uptoGen: Long): Unit = {
    val (leases, released) = leaseFiles(fs, storePath)
    leases.foreach { case (g, p) => if (g <= uptoGen) fs.delete(p, false): Unit }
    released.foreach { g =>
      if (g <= uptoGen)
        fs.delete(new Path(s"${leasePath(storePath)}.$g.released"), false): Unit
    }
  }

  /** Acquire the maintenance lease for `storePath`, failing LOUDLY if
    * an unexpired lease stands (naming the holder — the operator
    * decides whether to wait or raise the alarm, the code never
    * silently proceeds). An expired lease is taken over with a loud
    * log line at the next generation. */
  def acquire(spark: SparkSession, storePath: String, owner: String,
              ttlMs: Long = DefaultTtlMs): Held = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    val fs = fsFor(spark, storePath)
    val nonce = java.util.UUID.randomUUID().toString
    val (leases, released) = leaseFiles(fs, storePath)
    val maxGen = leases.keys.maxOption.getOrElse(0L)
    val takeover: Option[String] =
      leases.get(maxGen).filterNot(_ => released(maxGen)).map { p =>
        val f = readFields(fs, p).getOrElse(Map.empty)
        val (ageMs, heldTtl) = ageAndTtl(fs, p, f)
        require(ageMs > heldTtl,
          s"store $storePath is under maintenance by " +
            s"'${f.getOrElse("owner", "?")}' (generation $maxGen, held " +
            s"${ageMs} ms of ${heldTtl} ms TTL) — refusing a second " +
            "concurrent maintainer; wait for release/expiry or run " +
            "lease-break if the holder is known dead")
        f.getOrElse("owner", "?")
      }
    val gen = maxGen + 1
    takeover.foreach(prev => System.err.println(
      s"[StoreLease] taking over EXPIRED lease on $storePath from " +
        s"'$prev' as '$owner' (generation $gen) — the previous " +
        "maintainer stalled past its TTL; its commit will be refused"))
    val p = new Path(s"${leasePath(storePath)}.$gen")
    try createFile(fs, p, fieldBytes(Map(
      "owner" -> owner, "generation" -> gen.toString, "nonce" -> nonce,
      "acquiredAtMs" -> System.currentTimeMillis().toString,
      "ttlMs" -> ttlMs.toString)))
    catch {
      case e: java.io.IOException => throw new IllegalStateException(
        s"lost the acquire race for $storePath — another maintainer " +
          s"created generation $gen concurrently", e)
    }
    // Create-then-confirm, belt and suspenders over the atomic create:
    // re-read the lease and require it carries THIS acquire's nonce
    // before reporting Held — on any filesystem whose create-if-absent
    // is weaker than claimed (object stores), a racer that slipped
    // through is detected here, and at most one contender can confirm.
    require(readFields(fs, p).exists(_.get("nonce").contains(nonce)),
      s"lost the acquire race for $storePath — another maintainer's " +
        s"lease stands at $p after our create")
    // Bounded litter: generations two behind are superseded beyond any
    // live-view contender's target (every current view targets
    // maxGen+1 = gen; a view old enough to target <= gen-2 has stalled
    // across a full maintenance cycle and fails verify regardless).
    sweep(fs, storePath, gen - 2)
    Held(storePath, owner, gen, nonce)
  }

  /** Verify-on-commit: call immediately BEFORE the critical mutation
    * (the rename swap, the artifact overwrite). Fails loudly unless we
    * are still the HIGHEST generation, unreleased, and the lease file
    * still carries our nonce — i.e. nobody took over while we stalled;
    * committing after a takeover would race the new owner's writes. */
  def verify(spark: SparkSession, h: Held): Unit = {
    val fs = fsFor(spark, h.storePath)
    val (leases, released) = leaseFiles(fs, h.storePath)
    val maxGen = leases.keys.maxOption.getOrElse(0L)
    val ours = maxGen == h.generation && !released(h.generation) &&
      leases.get(maxGen).exists(p =>
        readFields(fs, p).exists(_.get("nonce").contains(h.nonce)))
    lazy val why =
      if (maxGen > h.generation)
        leases.get(maxGen).flatMap(p => readFields(fs, p))
          .map(g => s"taken over by '${g.getOrElse("owner", "?")}' " +
            s"(generation $maxGen)")
          .getOrElse(s"taken over (generation $maxGen)")
      else "released/removed"
    require(ours,
      s"lease on ${h.storePath} held by '${h.owner}' (generation " +
        s"${h.generation}) was " + why +
        " — aborting this commit instead of racing the new maintainer")
  }

  /** Release: publish the release marker for OUR generation (never
    * delete the contested file — a concurrent contender may be
    * arbitrating on it). A taken-over lease belongs to the new owner —
    * leave it untouched. */
  def release(spark: SparkSession, h: Held): Unit = {
    val fs = fsFor(spark, h.storePath)
    val p = new Path(s"${leasePath(h.storePath)}.${h.generation}")
    if (readFields(fs, p).exists(_.get("nonce").contains(h.nonce))) {
      try createFile(fs, new Path(s"$p.released"), Array.empty)
      catch { case _: java.io.IOException => () } // already marked
    }
  }

  /** Operator-readable lease state — the `ctl lease-status` view.
    * `expired` is the takeover-eligibility verdict computed with the
    * same arithmetic `acquire` uses, so what this reports as expired
    * is exactly what an acquire would take over. A released lease
    * reports as no lease. */
  final case class Status(owner: String, generation: Long, heldMs: Long,
                          ttlMs: Long, expired: Boolean)

  /** Inspect the standing lease on `storePath`, if any. Read-only. */
  def status(spark: SparkSession, storePath: String): Option[Status] = {
    val fs = fsFor(spark, storePath)
    val (leases, released) = leaseFiles(fs, storePath)
    val maxGen = leases.keys.maxOption.getOrElse(0L)
    leases.get(maxGen).filterNot(_ => released(maxGen)).map { p =>
      val f = readFields(fs, p).getOrElse(Map.empty)
      val (heldMs, ttl) = ageAndTtl(fs, p, f)
      Status(f.getOrElse("owner", "?"), maxGen, heldMs, ttl, heldMs > ttl)
    }
  }

  /** Operationally break a lease: an EXPIRED lease is removed silently
    * (the holder is dead by the TTL contract); a LIVE lease is refused
    * unless `force` — forcing is the "the holder is known dead but its
    * TTL hasn't run out" incident path the acquire error message points
    * at, and it logs loudly because the broken holder's verify-on-
    * commit will now fail by design. Sweeps every generation's file
    * and marker; do not run concurrently with acquires. Returns a
    * printable verdict. */
  def breakLease(spark: SparkSession, storePath: String,
                 force: Boolean = false): String = {
    val fs = fsFor(spark, storePath)
    status(spark, storePath) match {
      case None =>
        sweep(fs, storePath, Long.MaxValue) // released/torn litter
        s"no lease standing on $storePath"
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
        sweep(fs, storePath, Long.MaxValue)
        require(status(spark, storePath).isEmpty,
          s"failed to delete lease files under ${leasePath(storePath)}.*")
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
