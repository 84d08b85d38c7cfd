package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scale-spot for the streaming ingest family (VERDICT r10
  * item 5): l61/l66/stream_ann_serve dominate the bench (~24 s of
  * ~126 s) and the standing claim was "per-drop cost is streaming-run
  * startup, fixed — not O(data)". This main tests that claim by
  * running the SAME 4-drop l66 crawl loop (IncrementalDedup.run with
  * compactEvery = 2, the graded query's exact shape) at two corpus
  * sizes IN THE SAME JVM (this host drifts up to ~2.4x across minutes;
  * within one JVM both curves see the same weather), in three
  * configurations that decompose the cost:
  *
  *   A. scaled dup-pool (template pool grows with n, dup-GROUP SIZE
  *      constant — the realistic crawl shape): per-drop cost should
  *      grow ~linearly with drop size, sitting on the fixed startup
  *      floor.
  *   B. fixed dup-pool (75 templates at every n, group size ∝ corpus):
  *      the exact-pair verdict's per-drop cost is SUM over buckets of
  *      |new∩bucket|·|seen∩bucket| — quadratic in group size — so this
  *      curve measures the boilerplate cliff (cookie banners, licence
  *      headers: groups that grow with the crawl).
  *   C. fixed dup-pool with `exactCounts = false`: the linear
  *      bucket-min verdict (same first_match/is_dup bit for bit, no
  *      n_matches) must flatten B back toward A's shape — the measured
  *      proof that the cliff is the PAIR COUNT, not the loop.
  *
  * First measured run (this host, n=5000 vs 25000): A 9.8→~22 s
  * (≈2.2x at 5x data: startup floor + linear term), B 9.8→54 s with a
  * 33 s single drop (the quadratic term), C flattens B's drops back to
  * near-A (see README §scale for the committed numbers).
  *
  * Usage: sbt "runMain graft.StreamScaleSpot [smallN] [largeN]"
  */
object StreamScaleSpot {

  /** Deterministic corpus: 2/3 of docs draw from a `pool`-sized
    * template set (so dedup genuinely fires across drops), the rest
    * are unique. Expected dup-group size ≈ (2/3)·n / pool. */
  private def corpus(spark: SparkSession, n: Int, pool: Int) = {
    spark.range(n.toLong).select(col("id").as("doc_id"),
      when((col("id") * 2654435761L).bitwiseAND(lit(0x7fffffffL)) % (pool + pool / 2) < pool,
        concat(lit("template "),
          ((col("id") * 2654435761L).bitwiseAND(lit(0x7fffffffL)) % pool).cast("string"),
          lit(" shared sentence words alpha beta gamma delta epsilon zeta " +
            "eta theta repeated across many crawl drops")))
        .otherwise(concat(lit("unique document "), col("id").cast("string"),
          lit(" with its own words nothing else in the corpus resembles " +
            "this particular combination at all")))
        .as("text"))
  }

  private def runLoop(spark: SparkSession, n: Int, pool: Int, tag: String,
                      exactCounts: Boolean): Array[Double] = {
    import graft.streaming.IncrementalDedup
    val docs = corpus(spark, n, pool)
    val root = Scratch.dir(s"graft_scalespot_$tag")
    val cfg = IncrementalDedup.Config("doc_id", "text",
      shingleN = 3, numHashes = 8, rowsPerBand = 2, exactCounts = exactCounts)
    val secs = new Array[Double](4)
    (0 until 4).foreach { k =>
      docs.filter(col("doc_id") % 4 === k)
        .write.mode("append").parquet(s"$root/src")
      val t0 = System.nanoTime()
      IncrementalDedup.run(
        spark.readStream.schema(docs.schema).parquet(s"$root/src"),
        cfg, s"$root/bands", s"$root/out", s"$root/ckpt",
        compactEvery = 2).awaitTermination()
      secs(k) = (System.nanoTime() - t0) / 1e9
    }
    secs
  }

  def main(args: Array[String]): Unit = {
    val smallN = args.headOption.map(_.toInt).getOrElse(5000)
    val largeN = args.lift(1).map(_.toInt).getOrElse(5 * smallN)
    val spark = GraftSession.local()
    // one throwaway loop warms the JVM (codegen, shuffle, state store)
    // so no measured curve pays first-run JIT costs
    runLoop(spark, 500, 75, "warm", exactCounts = true)
    def fmt(a: Array[Double]) = a.map(s => f"$s%.2f").mkString(" ")
    def report(name: String, a: Array[Double]): Double = {
      println(f"[scalespot] $name per-drop: ${fmt(a)} total ${a.sum}%.2f s")
      a.sum
    }
    // A: constant expected group size (~44 docs) at both corpus sizes
    val poolS = math.max(1, smallN * 2 / 3 / 44)
    val poolL = math.max(1, largeN * 2 / 3 / 44)
    val aS = report(f"A small n=$smallN pool=$poolS exact", runLoop(spark, smallN, poolS, "a_small", true))
    val aL = report(f"A large n=$largeN pool=$poolL exact", runLoop(spark, largeN, poolL, "a_large", true))
    // B/C: FIXED pool — group size grows 5x with the corpus
    val bL = report(f"B large n=$largeN pool=75 exact", runLoop(spark, largeN, 75, "b_large", true))
    val cL = report(f"C large n=$largeN pool=75 lite", runLoop(spark, largeN, 75, "c_large", false))
    println(f"[scalespot] data ratio ${largeN.toDouble / smallN}%.1fx | " +
      f"A (const groups, exact) ${aL / aS}%.2fx | " +
      f"B/A (grown groups, exact) ${bL / aL}%.2fx | " +
      f"C/A (grown groups, lite) ${cL / aL}%.2fx")
    spark.stop()
  }
}
