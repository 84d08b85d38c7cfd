package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Decontaminate

/** Scale rehearsal for the streaming DECONTAMINATION guard — the
  * route-at-ingest twin of WinnowIngestScaleRehearsalSpec. l111 grades
  * the guard at four drops; "the benchmark store is fingerprinted once
  * and a drop's cost never grows with the crawl" is a claim about the
  * curve. This runs 16 drops through `IncrementalDedup.runDecontaminate`
  * against one persisted eval store and asserts:
  *
  *  (a) THE STORE NEVER RE-SHINGLES HISTORY: the eval fingerprint
  *      store's file listing (names + sizes + mtimes) after the last
  *      drop is byte-identical to the listing after the build — the
  *      loop only ever READS it; eval text never travels.
  *  (b) FLAT PER-DROP COST: per-turn work is |drop| fingerprinting +
  *      one broadcast join against the benchmark-sized store, so late
  *      drops cost what early drops cost (10x wall-clock backstop —
  *      this host drifts; the structural claim is (a) plus the plan
  *      shape).
  *  (c) VERDICTS == BATCH: the accumulated per-doc verdicts equal
  *      `Decontaminate.spanOverlapStats` recomputed over the union
  *      corpus (the store is static, so a verdict depends only on the
  *      doc's own fingerprints), and every drop's leak partition holds
  *      exactly its contaminated ids — the DLQ-shaped routing claim.
  *  (d) ZERO Spark state by the ENGINE'S OWN accounting: foreachBatch
  *      loops keep their state on disk; stateOperators must report no
  *      rows at any batch.
  */
class DecontaminateIngestRehearsalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IncrementalDedup.DecontConfig("doc_id", "text",
    k = 3, w = 2, minShared = 2)

  // benchmark: 5 eval docs, each one distinctive 12-token span
  private def evalSpan(i: Int): String =
    (1 to 12).map(t => s"e${i}v$t").mkString(" ")
  private def evalDf =
    (0 until 5).map(i => (10000L + i, evalSpan(i))).toDF("doc_id", "text")

  // drop k: 40 docs; docs 0-2 quote eval span (k % 5), (k+1) % 5,
  // (k+2) % 5 — three guaranteed leaks per drop; the rest are
  // per-doc-unique filler (no accidental overlap)
  private def filler(id: Long): String =
    (1 to 14).map(t => s"f${id}u$t").mkString(" ")
  private def dropDf(k: Int) =
    (0 until 40).map { i =>
      val id = k * 1000L + i
      val text =
        if (i < 3) s"${filler(id)} ${evalSpan((k + i) % 5)}"
        else filler(id)
      (id, text)
    }.toDF("doc_id", "text")

  test("16-drop decontamination guard: read-only store, flat per-drop cost, batch-identical verdicts, exact leak routing") {
    val nDrops = sys.env.get("GRAFT_REHEARSAL_DROPS").map(_.toInt).getOrElse(16)
    val root = Files.createTempDirectory("graft_dc_rehearsal").toString
    val src = s"$root/src"; val evalFp = s"$root/evalfp"
    val out = s"$root/out"; val leak = s"$root/leak"; val ckpt = s"$root/ckpt"

    IncrementalDedup.buildEvalFpStore(evalDf, cfg, evalFp)
    def storeListing(): Seq[(String, Long, Long)] =
      new java.io.File(evalFp).listFiles().toSeq
        .map(f => (f.getName, f.length(), f.lastModified())).sortBy(_._1)
    val builtListing = storeListing()

    val schema = dropDf(0).schema
    val secs = new Array[Double](nDrops)
    (0 until nDrops).foreach { k =>
      dropDf(k).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      val q = IncrementalDedup.runDecontaminate(
        spark.readStream.schema(schema).parquet(src),
        cfg, evalFp, out, leak, ckpt)
      q.awaitTermination()
      secs(k) = (System.nanoTime() - t0) / 1e9
      // (d) zero state rows at every batch, by the engine's counter
      q.recentProgress.foreach { p =>
        assert(p.stateOperators.forall(_.numRowsTotal == 0L),
          s"drop $k: foreachBatch guard reported state-store rows: " +
            p.stateOperators.map(_.numRowsTotal).mkString(" "))
      }
    }
    println(s"[decon-rehearsal] drops=$nDrops docs/drop=40")
    println("[decon-rehearsal] per-drop seconds: " +
      secs.map(s => f"$s%.2f").mkString(" "))

    // (a) the benchmark store was never rewritten, re-shingled, or even
    // touched — name/size/mtime identical to the post-build listing
    assert(storeListing() == builtListing,
      "the eval fingerprint store changed during the crawl — the guard " +
        "must be read-only over history")

    // (b) flat per-drop cost (wall-clock backstop; the structural
    // guarantee is the read-only store + per-drop fingerprinting)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val earlyMed = median(secs.slice(2, 6).toIndexedSeq)
    val lateMed = median(secs.takeRight(4).toIndexedSeq)
    println(f"[decon-rehearsal] per-drop medians (diagnostic): early $earlyMed%.2f s, late $lateMed%.2f s")
    assert(lateMed <= 10 * earlyMed.max(0.1),
      f"late-drop median $lateMed%.2f s exceeds 10x early median $earlyMed%.2f s — per-drop cost is not flat")

    // (c) accumulated verdicts == batch recompute over the union corpus
    val union = (0 until nDrops).map(dropDf).reduce(_ union _)
    val batch = Decontaminate.spanOverlapStats(union, evalDf, "doc_id", "text",
        k = cfg.k, w = cfg.w, minShared = cfg.minShared)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val streamed = IncrementalDedup.results(spark, out)
      .select(col("doc_id"), col("n_fp"), col("n_overlap"), col("contaminated"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch,
      s"guard verdicts must equal the batch chain: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    // every drop planted exactly 3 leaks; the routing wrote exactly the
    // contaminated set into each drop's leak partition
    val routed = IncrementalDedup.results(spark, leak)
      .select(col("doc_id"), col("ingest_batch").cast("long").as("b"))
      .as[(Long, Long)].collect().toSet
    val expected = (0 until nDrops)
      .flatMap(k => (0 until 3).map(i => (k * 1000L + i, k.toLong))).toSet
    assert(routed == expected,
      s"leak routing must hold exactly the planted contaminated docs per drop: " +
        s"extra=${routed -- expected}, missing=${expected -- routed}")
  }
}
