package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decode-free perceptual hash family (Multimodal.blockSums /
  * perceptualHashes / perceptualNearDupPairs): exactness of the block
  * grid against a driver-side recompute, the robustness contract
  * (sum-preserving byte perturbations leave the hash fixed; content
  * changes move it), and the Hamming-band LSH's pigeonhole recall
  * against a brute-force pair scan. */
class PerceptualSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def payloads(rows: (Long, Array[Byte])*) =
    rows.toDF("doc_id", "payload")

  /** Driver-side reference: block sums at floor boundaries. */
  private def refSums(bytes: Array[Byte], n: Int): Seq[Long] =
    (0 until n).map { b =>
      val lo = b.toLong * bytes.length / n
      val hi = (b + 1).toLong * bytes.length / n
      (lo until hi).map(i => (bytes(i.toInt) & 0xff).toLong).sum
    }

  /** Driver-side reference hashes via the same cross-multiplied
    * integer comparisons. */
  private def refHashes(bytes: Array[Byte]): (Long, Long) = {
    val n = 64
    val s = refSums(bytes, n)
    val lens = (0 until n).map(b =>
      (b + 1).toLong * bytes.length / n - b.toLong * bytes.length / n)
    val tot = s.sum
    val a = (0 until n).map(b =>
      if (s(b) * bytes.length > tot * lens(b)) 1L << b else 0L).sum
    val d = (0 until n).map { b =>
      val c = (b + 1) % n
      if (s(b) * lens(c) > s(c) * lens(b)) 1L << b else 0L
    }.sum
    (a, d)
  }

  private def rndBytes(seed: Int, len: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(len)((32 + r.nextInt(95)).toByte) // printable ASCII
  }

  test("blockSums matches the driver-side recompute at awkward lengths") {
    val lens = Seq(1, 63, 64, 65, 100, 128, 300, 1024)
    val df = payloads(lens.zipWithIndex.map { case (l, i) =>
      i.toLong -> rndBytes(i, l)
    }: _*)
    val got = df.select(col("doc_id"),
        Multimodal.blockSums(col("payload"), 64).as("bs"))
      .as[(Long, Seq[Long])].collect().toMap
    lens.zipWithIndex.foreach { case (l, i) =>
      assert(got(i.toLong) == refSums(rndBytes(i, l), 64),
        s"block sums diverge at payload length $l")
    }
  }

  test("blockSums is exact on full-range binary — the 7-byte-chunk read's hard cases") {
    // the chunked read renders up to 7 bytes as one conv'd long; a
    // high bit in the chunk's FIRST byte is where a wider chunk would
    // overflow the string→long cast, and short final chunks exercise
    // the missing-high-digit path. All-0xFF payloads maximize every
    // digit; full-range random bytes cover sign bits at every offset.
    // Lengths chosen so per-block lengths sweep 1..7 (sub-chunk), 8-14
    // (chunk+tail), and non-multiples of 7.
    val r = new scala.util.Random(7)
    val cases: Seq[(Long, Array[Byte])] = Seq(
      10L -> Array.fill(64)(0xff.toByte),
      11L -> Array.fill(449)(0xff.toByte),
      12L -> Array.fill(200)((r.nextInt(256) - 128).toByte),
      13L -> Array.fill(901)((r.nextInt(256) - 128).toByte),
      14L -> Array.tabulate(77)(i => (i * 37 + 128).toByte))
    val got = payloads(cases: _*)
      .select(col("doc_id"), Multimodal.blockSums(col("payload"), 64).as("bs"))
      .as[(Long, Seq[Long])].collect().toMap
    cases.foreach { case (id, bytes) =>
      assert(got(id) == refSums(bytes, 64),
        s"block sums diverge on full-range payload $id (len ${bytes.length})")
    }
  }

  test("perceptualHashes matches the cross-multiplied integer reference, bit 63 included") {
    // force bit 63 coverage: a payload whose LAST cell is much heavier
    // than its successor (cell 0) sets dHash bit 63; heavier than the
    // global mean sets aHash bit 63 — Long.MinValue packing on both
    val hot = Array.fill(64 * 2)(' '.toByte)
    (126 until 128).foreach(i => hot(i) = 126.toByte)
    val inputs = Seq(0L -> rndBytes(7, 256), 1L -> rndBytes(8, 300),
      2L -> hot)
    val got = payloads(inputs: _*)
      .transform(Multimodal.perceptualHashes(_, "doc_id", "payload"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    inputs.foreach { case (id, bytes) =>
      assert(got(id) == refHashes(bytes), s"hash mismatch for doc $id")
    }
    assert(got(2L)._1 < 0 && got(2L)._2 < 0,
      "the hot-tail payload must set bit 63 (negative two's-complement) in both hashes")
  }

  test("sum-preserving re-encode leaves both hashes fixed; a content change moves them") {
    // adjacent pair swap on a %128-length payload: every cell keeps
    // its sum (even offsets, even lengths), every byte 8-gram dies
    val base = rndBytes(42, 384)
    val swapped = base.grouped(2).flatMap(p => p.reverse).toArray
    assert(!base.sameElements(swapped))
    val df = payloads(0L -> base, 1L -> swapped,
      2L -> base.reverse) // reversal moves cell content: real change
    val h = Multimodal.perceptualHashes(df, "doc_id", "payload")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(h(0L) == h(1L), "pair swap must preserve both hashes exactly")
    assert(h(0L) != h(2L), "byte reversal must move the raster hashes")
  }

  test("Hamming-band LSH recall equals the brute-force scan for maxHamming <= 3") {
    // 40 payloads: 10 bases, each with a hamming-0 twin (swap), plus
    // noise docs — brute-force dHash pairs at <= 3 must equal the
    // banded operator's output exactly (pigeonhole: 3 flips cannot
    // dirty all 4 bands)
    val rows = (0 until 10).flatMap { i =>
      val b = rndBytes(100 + i, 128 + 128 * (i % 3))
      Seq(i.toLong -> b, (100L + i) -> b.grouped(2).flatMap(_.reverse).toArray)
    } ++ (0 until 20).map(i => (200L + i) -> rndBytes(500 + i, 256))
    val df = payloads(rows: _*)
    val got = Multimodal.perceptualNearDupPairs(df, "doc_id", "payload", maxHamming = 3)
      .select("da", "db", "hamming").as[(Long, Long, Long)].collect().toSet
    val hashes = Multimodal.perceptualHashes(df, "doc_id", "payload")
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      a <- hashes; b <- hashes if a._1 < b._1
      h = java.lang.Long.bitCount(a._3 ^ b._3) if h <= 3
    } yield (a._1, b._1, h.toLong)).toSet
    assert(got == brute,
      s"banded pairs must equal brute force: only-banded=${got -- brute}, missed=${brute -- got}")
    assert(brute.size >= 10, "every swap twin must appear at hamming 0")
  }
}
