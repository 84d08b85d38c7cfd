package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The coverage manifest is what stands between compaction recovery and
  * destroying partitions a stage does not cover — its two contracts get
  * property coverage, not just the spec-path examples:
  * round-trip fidelity for arbitrary id sets, and the guarantee that NO
  * byte-level truncation of a committed manifest ever parses as a
  * (necessarily wrong) coverage set. */
class FoldManifestSpec extends AnyFunSuite {

  private val fs = new Path("/tmp").getFileSystem(new org.apache.hadoop.conf.Configuration())

  private def freshStage(): Path = {
    val d = Files.createTempDirectory("fold_manifest_prop")
    new Path(d.toString)
  }

  private val tagSets: Seq[Seq[Long]] = {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L)).map(_.distinct)
    (0 until 40).flatMap(i => gen(Gen.Parameters.default, Seed(1234L + i)).map(_.toSeq))
  }

  test("round-trip: read(write(tags)) == tags for arbitrary id sets") {
    tagSets.foreach { tags =>
      val sp = freshStage()
      FoldManifest.write(fs, sp, tags)
      assert(FoldManifest.read(fs, sp) == Some(tags.toSet), s"tags=$tags")
      fs.delete(sp, true)
    }
  }

  test("state(): Absent without a file, Unreadable on malformed bytes, Covered on a commit") {
    val sp = freshStage()
    // no _FOLDED at all: arming provably never happened
    assert(FoldManifest.state(fs, sp) == FoldManifest.Absent)
    FoldManifest.write(fs, sp, Seq(3L, 7L))
    assert(FoldManifest.state(fs, sp) == FoldManifest.Covered(Set(3L, 7L)))
    // mangle the committed bytes: the file EXISTS, so this is NOT
    // "never armed" — recovery must not auto-discard on it
    Files.write(Paths.get(sp.toString, "_FOLDED"), "2\n3".getBytes)
    Files.deleteIfExists(Paths.get(sp.toString, "._FOLDED.crc"))
    assert(FoldManifest.state(fs, sp) == FoldManifest.Unreadable)
    assert(FoldManifest.read(fs, sp).isEmpty)
    fs.delete(sp, true)
  }

  test("no truncation of a committed manifest parses as a coverage set") {
    // ids chosen so single-line prefixes still look id-like — the count
    // header + END terminator must catch what shape alone cannot
    val tags = Seq(1L, 22L, 333L, 4444L)
    val sp = freshStage()
    FoldManifest.write(fs, sp, tags)
    val full = Files.readAllBytes(Paths.get(sp.toString, "_FOLDED"))
    (0 until full.length).foreach { len =>
      Files.write(Paths.get(sp.toString, "_FOLDED"), full.take(len))
      // hadoop's checksum sidecar would reject the rewrite before the
      // parser even sees it; delete it so the PARSER is what's tested
      Files.deleteIfExists(Paths.get(sp.toString, "._FOLDED.crc"))
      assert(FoldManifest.read(fs, sp).isEmpty,
        s"byte-prefix of length $len parsed as a coverage set")
    }
    fs.delete(sp, true)
  }
}
