package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class StoreLeaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a second concurrent maintainer fails loudly at acquire, naming the holder") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease1").toString + "/s"
    val h = StoreLease.acquire(spark, store, "vacuum-a")
    val e = intercept[IllegalArgumentException](
      StoreLease.acquire(spark, store, "vacuum-b"))
    assert(e.getMessage.contains("vacuum-a") &&
      e.getMessage.contains("under maintenance"))
    StoreLease.release(spark, h)
    // released → a new maintainer acquires cleanly
    StoreLease.release(spark, StoreLease.acquire(spark, store, "vacuum-b"))
  }

  test("an expired lease is taken over with a bumped generation; the stalled holder's verify fails") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease2").toString + "/s"
    val stalled = StoreLease.acquire(spark, store, "slow", ttlMs = 1)
    Thread.sleep(5)
    val fresh = StoreLease.acquire(spark, store, "takeover")
    assert(fresh.generation == stalled.generation + 1)
    // the stalled holder reaches its commit point late: verify-on-commit
    // refuses by name instead of letting it race the new owner's swap
    val e = intercept[IllegalArgumentException](StoreLease.verify(spark, stalled))
    assert(e.getMessage.contains("taken over") && e.getMessage.contains("takeover"))
    // the new owner's own verify passes, and its release leaves no lease
    StoreLease.verify(spark, fresh)
    StoreLease.release(spark, fresh)
    // a stalled holder's release is a no-op on someone else's lease
    val again = StoreLease.acquire(spark, store, "third")
    StoreLease.release(spark, stalled) // not ours — must not delete
    StoreLease.verify(spark, again)
    StoreLease.release(spark, again)
  }

  test("a bare pre-generation lease file is seen as a standing lease (mixed-version window)") {
    // the upgrade race this guards: an old-code maintainer holds the
    // bare `<store>.lease` file while a new-code maintainer arbitrates
    // — if the bare file were invisible, the new acquirer would mint
    // generation 1 alongside a live legacy holder (two holders).
    val store = java.nio.file.Files.createTempDirectory("graft_leaseleg")
      .toString + "/s"
    def writeBare(fields: Map[String, String]): Unit = {
      val p = java.nio.file.Paths.get(StoreLease.leasePath(store))
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, fields.map { case (k, v) => s"$k=$v" }
        .mkString("\n").getBytes("UTF-8"))
    }
    writeBare(Map("owner" -> "legacy-holder",
      "acquiredAtMs" -> System.currentTimeMillis().toString,
      "ttlMs" -> "600000"))
    val e = intercept[IllegalArgumentException](
      StoreLease.acquire(spark, store, "new-code"))
    assert(e.getMessage.contains("legacy-holder"),
      s"a live legacy lease must be refused by name: ${e.getMessage}")
    // an EXPIRED legacy lease is taken over at generation 1 like any
    // stalled generation-0 holder
    writeBare(Map("owner" -> "legacy-holder",
      "acquiredAtMs" -> (System.currentTimeMillis() - 100000).toString,
      "ttlMs" -> "1"))
    val h = StoreLease.acquire(spark, store, "new-code")
    assert(h.generation == 1L,
      s"takeover of the legacy file must mint generation 1, got ${h.generation}")
    StoreLease.verify(spark, h)
    StoreLease.release(spark, h)
  }

  test("a torn bare lease with an unparsable generation folds to generation 0 instead of crashing") {
    // two torn shapes that both pass a naive forall(isDigit) check:
    // "generation=" (empty — vacuously all-digits) and an overlong
    // digit string past Long range; either would have crashed
    // arbitration with NumberFormatException, wedging acquire forever
    for (torn <- Seq("", "9" * 25)) {
      val store = java.nio.file.Files.createTempDirectory("graft_leasetorn")
        .toString + "/s"
      val p = java.nio.file.Paths.get(StoreLease.leasePath(store))
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        (s"owner=legacy-holder\ngeneration=$torn\n" +
          s"acquiredAtMs=${System.currentTimeMillis() - 100000}\nttlMs=1")
          .getBytes("UTF-8"))
      // expired + generation unparsable -> folds to gen 0, takeover at 1
      val h = StoreLease.acquire(spark, store, "new-code")
      assert(h.generation == 1L,
        s"torn generation '$torn' must fold to 0 and take over at 1, got ${h.generation}")
      StoreLease.release(spark, h)
    }
  }

  test("racing takeovers of one expired lease mint exactly one holder") {
    // the delete-then-create interleave this guards against: A deletes
    // the expired lease, A creates; B deletes A's FRESH lease, B
    // creates — two live holders staging into the same tmp paths. The
    // rename-to-tombstone takeover + create-then-confirm must let
    // exactly ONE racer return Held per round, every round.
    val store = java.nio.file.Files.createTempDirectory("graft_leaserace")
      .toString + "/s"
    for (round <- 1 to 10) {
      StoreLease.acquire(spark, store, s"stall-$round", ttlMs = 1)
      Thread.sleep(3) // expire it
      val results =
        new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, StoreLease.Held]]()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val racers = (1 to 3).map { t =>
        new Thread(() => {
          gate.await()
          results.add(
            try Right(StoreLease.acquire(spark, store, s"racer-$t-$round"))
            catch { case e: Throwable => Left(e) })
        })
      }
      racers.foreach(_.start()); gate.countDown(); racers.foreach(_.join())
      val all = results.toArray(Array.empty[Either[Throwable, StoreLease.Held]])
      val winners = all.collect { case Right(h) => h }
      // the mutual-exclusion contract: NEVER two concurrent holders.
      // Zero holders is a legal (rare) outcome — a steal detected and
      // restored after the displaced racer already aborted leaves the
      // restored lease standing with no live holder; it self-resolves
      // by TTL (here: cleared for the next round).
      assert(winners.length <= 1,
        s"round $round minted ${winners.length} holders: $all")
      winners.headOption match {
        case Some(h) =>
          // the loser failed loudly; the winner's verify passes and its
          // release clears the lease
          StoreLease.verify(spark, h)
          StoreLease.release(spark, h)
          assert(StoreLease.status(spark, store).isEmpty)
        case None =>
          StoreLease.breakLease(spark, store, force = true): Unit
      }
    }
    // takeovers leave no tombstone litter beside the lease
    val dir = new java.io.File(store).getParentFile
    assert(dir.listFiles().forall(!_.getName.contains(".expired.")),
      s"tombstones left behind: ${dir.listFiles().map(_.getName).mkString(",")}")
  }

  test("withLease releases on success AND on body failure") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease3").toString + "/s"
    assert(StoreLease.withLease(spark, store, "ok")(_ => 42) == 42)
    intercept[RuntimeException](
      StoreLease.withLease(spark, store, "boom")(_ => throw new RuntimeException("x")))
    // both paths released: acquire succeeds immediately
    StoreLease.release(spark, StoreLease.acquire(spark, store, "after"))
  }

  test("status reports the holder and expiry; breakLease refuses live without --force") {
    val store = java.nio.file.Files.createTempDirectory("graft_lease_st").toString + "/s"
    assert(StoreLease.status(spark, store).isEmpty)
    assert(StoreLease.breakLease(spark, store).contains("no lease standing"))

    val h = StoreLease.acquire(spark, store, "vacuum-a")
    val live = StoreLease.status(spark, store).get
    assert(live.owner == "vacuum-a" && live.generation == 1 && !live.expired)
    // live lease: refused without force, holder named
    val e = intercept[IllegalArgumentException](StoreLease.breakLease(spark, store))
    assert(e.getMessage.contains("LIVE") && e.getMessage.contains("vacuum-a"))
    // forced break clears it, and the broken holder's verify refuses
    assert(StoreLease.breakLease(spark, store, force = true).contains("LIVE lease"))
    intercept[IllegalArgumentException](StoreLease.verify(spark, h))

    // expired lease: broken without force
    StoreLease.acquire(spark, store, "slow", ttlMs = 1)
    Thread.sleep(5)
    assert(StoreLease.status(spark, store).exists(_.expired))
    assert(StoreLease.breakLease(spark, store).contains("expired"))
    assert(StoreLease.status(spark, store).isEmpty)
  }

  test("a second concurrent vacuum fails loudly instead of silently losing bytes") {
    // the race the lease exists for: maintainer A holds the blob store's
    // lease (mid-vacuum); maintainer B's vacuumBlobStore must fail at
    // acquire — before B reads, stages, or renames anything
    val root = java.nio.file.Files.createTempDirectory("graft_leasevac").toString
    val all = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val ptr = Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$root/store", nFiles = 1)
    val a = StoreLease.acquire(spark, s"$root/store", "vacuum-A")
    val e = intercept[IllegalArgumentException](
      Multimodal.vacuumBlobStore(spark, s"$root/store", ptr, nFiles = 1))
    assert(e.getMessage.contains("vacuum-A"))
    // appends and rebuilds honor the same lease
    val e2 = intercept[IllegalArgumentException](Multimodal.appendBlobStore(
      spark, Multimodal.asBinary(all, "doc_id", "text"), s"$root/store", 1))
    assert(e2.getMessage.contains("vacuum-A"))
    StoreLease.release(spark, a)
    // with the lease free the same vacuum proceeds
    assert(Multimodal.vacuumBlobStore(spark, s"$root/store", ptr, nFiles = 1)
      == ((2L, 0L)))
  }

  test("every ctl store-maintenance verb refuses to run against a held store") {
    val root = java.nio.file.Files.createTempDirectory("graft_ctl_lease").toString
    // one store per family, built BEFORE the holds (builders take the lease)
    val emb = (0L until 8L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 3 + d) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    AnnIndex.buildIvfPq(emb, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, nCentroids = 2, dir = s"$root/ix")
    // a torn stage makes the AUTOCOMPACT probes need recovery — the
    // leased path; without one the probes are read-only by design.
    // index-delete gets a CLEAN index (ix2): its id-type lookup fails
    // fast on a torn stage before ever reaching the lease.
    AnnIndex.buildIvfPq(emb, "vec_id", "embedding",
      dim = 8, m = 2, k = 4, nCentroids = 2, dir = s"$root/ix2")
    assert(new java.io.File(s"$root/ix/codes/.compact_tmp_1").mkdirs())
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/bands"))
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$root/bands/.compact_tmp2_1"))
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$root/store")

    val holds = Seq(s"$root/ix", s"$root/ix2", s"$root/bands", s"$root/store")
      .map(p => StoreLease.acquire(spark, p, "ops-hold"))
    val verbs = Seq(
      "index-compact" -> Array("ix", "9"),
      "index-autocompact" -> Array("ix", "1", "9"),
      "index-delete" -> Array("ix2", "vec_id", "1,2", "erase"),
      "bands-compact" -> Array("bands", "9"),
      "bands-autocompact" -> Array("bands", "1", "9"),
      "bands-resolve" -> Array("bands", "discard"),
      "stats-refresh" -> Array("store", "k"),
      "bloom-refresh" -> Array("store", "k"))
    verbs.foreach { case (verb, args) =>
      graft.Ctl.run(spark, root, verb, args) match {
        case Left(err) => assert(
          err.contains("ops-hold") && err.contains("under maintenance"),
          s"$verb must refuse naming the holder, got: $err")
        case Right(out) => fail(s"$verb ran against a held store: $out")
      }
    }
    holds.foreach(StoreLease.release(spark, _))
  }

  test("ANN maintainers share the index lease") {
    val emb = (0L until 8L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_leaseann").toString + "/ix"
    AnnIndex.buildIvfPq(emb.filter($"vec_id" < 4), "vec_id", "embedding",
      dim = 8, m = 2, k = 4, nCentroids = 2, dir = dir)
    val h = StoreLease.acquire(spark, dir, "ops-hold")
    val e = intercept[IllegalArgumentException](AnnIndex.appendVectors(
      spark, dir, emb.filter($"vec_id" >= 4), "vec_id", "embedding",
      dim = 8, m = 2, ingestTag = "batch_0"))
    assert(e.getMessage.contains("ops-hold"))
    val e2 = intercept[IllegalArgumentException](AnnIndex.deleteVectors(
      spark, dir, Seq(1L).toDF("vec_id"), "vec_id", "erase"))
    assert(e2.getMessage.contains("ops-hold"))
    StoreLease.release(spark, h)
    AnnIndex.appendVectors(spark, dir, emb.filter($"vec_id" >= 4),
      "vec_id", "embedding", dim = 8, m = 2, ingestTag = "batch_0")
  }
}
