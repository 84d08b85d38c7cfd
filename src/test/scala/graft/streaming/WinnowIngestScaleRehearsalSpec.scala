package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** Scale rehearsal for the SPAN-side ingest loop — the winnow twin of
  * AnnIngestScaleRehearsalSpec. `IncrementalDedup.runWinnow` is
  * spec-verified at 3–4 drops; "the fingerprint store survives a
  * rolling crawl" is a claim about the curve, not one point. This runs
  * 16 drops (32 via GRAFT_REHEARSAL_DROPS=32) through the real loop —
  * AvailableNow + checkpoint + in-loop `compactEvery = 2` folds — and
  * asserts:
  *
  *  (a) BOUNDED LAYOUT: the store never exceeds folded + compactEvery
  *      + 1 partitions after any drop, so store open cost (listing,
  *      strictly-before filter) is O(1) in drops.
  *  (b) FLAT PER-DROP COST, asserted on WORK (store file count stays
  *      flat) with a generous wall-clock backstop — per-drop work is
  *      |drop| tokenization + one fp-bucketed probe join against the
  *      store, never a re-tokenization of history.
  *  (c) LOSS-FREE ACCUMULATION: the loop's accumulated pair verdicts
  *      equal the batch recompute of cross-drop winnow pairs over the
  *      union corpus — folds and replays may reorganize files, never
  *      fingerprints.
  */
class WinnowIngestScaleRehearsalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wcfg = IncrementalDedup.WinnowConfig("doc_id", "text",
    k = 3, w = 2, minShared = 2)

  // Drop k: 40 docs; docs 0-4 of each drop carry span S(k, i) AND copy
  // span S(k-1, i) from the previous drop's doc i — a rolling chain of
  // exactly 5 cross-drop copied spans per drop, everything else
  // per-doc-unique vocabulary (no accidental pairs).
  private def span(k: Int, i: Int): String =
    (1 to 12).map(t => s"s${k}x${i}t$t").mkString(" ")
  private def filler(id: Long): String =
    (1 to 14).map(t => s"f${id}u$t").mkString(" ")
  private def dropDf(k: Int) =
    (0 until 40).map { i =>
      val id = k * 1000L + i
      val text =
        if (i < 5 && k > 0) s"${filler(id)} ${span(k - 1, i)} ${span(k, i)}"
        else if (i < 5) s"${filler(id)} ${span(k, i)}"
        else filler(id)
      (id, text)
    }.toDF("doc_id", "text")

  test("16-drop winnow ingest: bounded store layout, flat per-drop cost, batch-identical pairs") {
    val nDrops = sys.env.get("GRAFT_REHEARSAL_DROPS").map(_.toInt).getOrElse(16)
    val root = Files.createTempDirectory("graft_wn_rehearsal").toString
    val src = s"$root/src"; val fps = s"$root/fps"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val schema = dropDf(0).schema

    def storeDirs(): Int =
      new java.io.File(fps).listFiles().toSeq
        .count(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    def dataFiles(): Int = {
      var n = 0
      Files.walk(Paths.get(fps)).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) n += 1
      }
      n
    }

    val secs = new Array[Double](nDrops)
    val dirsAfter = new Array[Int](nDrops)
    val filesAfter = new Array[Int](nDrops)
    (0 until nDrops).foreach { k =>
      dropDf(k).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      val q = IncrementalDedup.runWinnow(
        spark.readStream.schema(schema).parquet(src),
        wcfg, fps, out, ckpt, compactEvery = 2)
      q.awaitTermination()
      secs(k) = (System.nanoTime() - t0) / 1e9
      // the engine's OWN state accounting: the loop's state is the
      // on-disk fp store (bounded by (a) below) — the Spark state
      // store must hold ZERO rows at every batch, or the foreachBatch
      // loop would secretly be O(keys) in checkpoint state
      q.recentProgress.foreach { p =>
        assert(p.stateOperators.forall(_.numRowsTotal == 0L),
          s"drop $k: foreachBatch loop reported state-store rows: " +
            p.stateOperators.map(_.numRowsTotal).mkString(" "))
      }
      dirsAfter(k) = storeDirs()
      filesAfter(k) = dataFiles()
      // (a) bounded layout after EVERY drop: folded + compactEvery + 1
      assert(dirsAfter(k) <= 4,
        s"drop $k left ${dirsAfter(k)} store partitions — folds are not amortizing")
    }
    println(s"[winnow-rehearsal] drops=$nDrops docs/drop=40")
    println("[winnow-rehearsal] per-drop seconds: " +
      secs.map(s => f"$s%.2f").mkString(" "))
    println("[winnow-rehearsal] store partitions: " + dirsAfter.mkString(" "))
    println("[winnow-rehearsal] parquet files:    " + filesAfter.mkString(" "))

    // (b) flat per-drop READ WORK: the store files a drop can touch are
    // exactly the current data files; wall-clock is a 10x backstop only
    // (this host drifts ~1.3-2.4x on unchanged code — README)
    val ref = filesAfter(3).max(1)
    filesAfter.zipWithIndex.drop(4).foreach { case (n, i) =>
      assert(n <= 2 * ref,
        s"file count creeping at drop $i: ${filesAfter.mkString(" ")}")
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val earlyMed = median(secs.slice(2, 6).toIndexedSeq)
    val lateMed = median(secs.takeRight(4).toIndexedSeq)
    println(f"[winnow-rehearsal] per-drop medians (diagnostic): early $earlyMed%.2f s, late $lateMed%.2f s")
    assert(lateMed <= 10 * earlyMed.max(0.1),
      f"late-drop median $lateMed%.2f s exceeds 10x early median $earlyMed%.2f s — per-drop cost is not flat")

    // (c) accumulated loop verdicts == batch recompute over the union:
    // cross-drop pairs only (the loop never probes same-drop pairs),
    // (new, seen) oriented by drop id (doc_id / 1000 encodes the drop)
    val union = (0 until nDrops).map(dropDf).reduce(_ union _)
    val batch = Dedup.winnowedSpanPairs(union, "doc_id", "text",
        k = wcfg.k, w = wcfg.w, minShared = wcfg.minShared)
      .filter((col("da") / 1000).cast("long") =!= (col("db") / 1000).cast("long"))
      .select(greatest(col("da"), col("db")).as("new_id"),
        least(col("da"), col("db")).as("seen_id"), col("n_shared"))
      .as[(Long, Long, Long)].collect().toSet
    val streamed = IncrementalDedup.results(spark, out)
      .select(col("new_id"), col("seen_id"), col("n_shared"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"loop pairs must equal the batch recompute: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    // the chain planted 5 copied spans per drop boundary — all found
    assert(streamed.size >= 5 * (nDrops - 1),
      s"expected at least ${5 * (nDrops - 1)} planted pairs, got ${streamed.size}")
  }
}
