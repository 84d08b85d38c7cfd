package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary plumbing: encode → partition-parallel decode → typed metadata") {
    val d = Seq((1L, "abcdef"), (2L, "xy")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.asBinary(d, "doc_id", "text"))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 6 && meta(1L).format == "png")    // 6 % 3 == 0
    assert(meta(2L).n_bytes == 2 && meta(2L).format == "webp")   // 2 % 3 == 2
    assert(meta(1L).width == 16 + 6 % 64 && meta(1L).frames == 1 + 6 % 4)
  }

  test("resize fits within bounds preserving aspect; features are deterministic fixed-dim") {
    val d = Seq((1L, "a" * 100)).toDF("doc_id", "text") // 100 bytes
    val bin = Multimodal.asBinary(d, "doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, bin) // width 16+100%64=52, height 16+100%48=20
    val resized = Multimodal.resizeMeta(spark, meta, maxW = 26, maxH = 26).collect().head
    assert(resized.width == 26 && resized.height == 10) // scale 0.5, aspect kept

    val f1 = Multimodal.extractFeatures(spark, bin).collect().head.getSeq[Float](1)
    val f2 = Multimodal.extractFeatures(spark, bin).collect().head.getSeq[Float](1)
    assert(f1.length == 8 && f1 == f2 && f1.forall(x => x >= 0f && x < 1f))
  }

  test("frame sampling emits every k-th frame index") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text") // 3 bytes → frames = 1 + 3%4 = 4
    val meta = Multimodal.decodeMeta(spark, Multimodal.asBinary(d, "doc_id", "text"))
    val frames = Multimodal.sampleFrames(spark, meta, everyK = 2)
      .as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 2)))
  }

  test("blob store: content addressing dedups, pointers restore losslessly, point fetch prunes") {
    // 200 docs over 40 distinct payloads — shared bytes store ONCE
    val d = (0 until 200).map(i => (i.toLong, s"payload body number ${i % 40} with shared content"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_blobspec").toString
    val bin = Multimodal.asBinary(d, "doc_id", "text")
    val pointers = Multimodal.writeBlobStore(spark, bin, s"$root/store", nFiles = 6)

    assert(spark.read.parquet(s"$root/store").count() == 40,
      "store must hold one row per distinct payload")
    assert(pointers.count() == 200, "every doc keeps its pointer")

    // restore through the store, decode, compare through the Delta gate
    val restored = Multimodal.joinBlobs(spark, s"$root/store", pointers)
      .select(col("doc_id"), decode(col("content"), "UTF-8").as("text"))
    Delta.assertLossless(restored, d, "blob-spec")

    // point fetch: 2 keys through the Bloom sidecar read < all files
    val keys = pointers.filter(col("doc_id").isin(3L, 7L))
      .select("blob_key").as[Long].collect().toSeq.distinct
    val scan = Multimodal.fetchBlobs(spark, s"$root/store", keys)
    assert(scan.filesRead < scan.filesTotal,
      s"read ${scan.filesRead}/${scan.filesTotal} — sidecar not pruning")
    val fetched = scan.df.select("blob_sha").as[String].collect().toSet
    val want = pointers.filter(col("doc_id").isin(3L, 7L))
      .select("blob_sha").as[String].collect().toSet
    assert(want.subsetOf(fetched), "point fetch must return the pointed-at blobs")
  }

  test("a dangling pointer fails the restore loudly, never a silent row drop") {
    val d = (0 until 30).map(i => (i.toLong, s"unique doc $i")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_blobspec2").toString
    val bin = Multimodal.asBinary(d, "doc_id", "text")
    val pointers = Multimodal.writeBlobStore(spark, bin, s"$root/store", nFiles = 4)
      .collect() // pin pointers BEFORE the store is damaged
    val pinned = spark.createDataFrame(
      spark.sparkContext.parallelize(pointers.toIndexedSeq),
      Multimodal.writeBlobStore(spark, bin, s"$root/store2", nFiles = 4).schema)

    // rebuild the store minus one blob — the deleted-media case
    val victim = pointers.head.getString(pointers.head.fieldIndex("blob_sha"))
    val truncated = spark.read.parquet(s"$root/store").filter(col("blob_sha") =!= victim)
    truncated.write.mode("overwrite").parquet(s"$root/damaged")

    // reading the bytes fails loudly with the sha named
    val e = intercept[Exception] {
      Multimodal.joinBlobs(spark, s"$root/damaged", pinned)
        .select(col("doc_id"), col("content")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("missing sha"),
      s"expected a loud missing-sha failure, got: ${e.getMessage}")

    // and a consumer that never touches the bytes still sees EVERY
    // pointer row (left join — dangling pointers are never silently
    // dropped; Catalyst prunes the unread guard column, which is fine
    // because cardinality is intact and any bytes access raises)
    assert(Multimodal.joinBlobs(spark, s"$root/damaged", pinned)
      .select(col("doc_id")).count() == 30)

    // a pointer frame that still carries its own `content` column fails
    // at the operator boundary (the restore would otherwise die later
    // on an ambiguous-reference error far from the cause)
    val ex = intercept[IllegalArgumentException](
      Multimodal.joinBlobs(spark, s"$root/damaged",
        pinned.withColumn("content", lit(Array[Byte]()))))
    assert(ex.getMessage.contains("content"))
  }

  test("appendBlobStore writes only new shas, replays are no-ops, all pointers resolve") {
    val root = java.nio.file.Files.createTempDirectory("graft_blobapp").toString
    val prev = Seq((1L, "shared"), (2L, "old only")).toDF("doc_id", "text")
    // 3 shares payload with 1; 4 is new — only ONE new blob may land
    val cur = Seq((3L, "shared"), (4L, "brand new")).toDF("doc_id", "text")
    Multimodal.writeBlobStore(spark, Multimodal.asBinary(prev, "doc_id", "text"),
      s"$root/store", nFiles = 2)
    val ptr = Multimodal.appendBlobStore(spark,
      Multimodal.asBinary(cur, "doc_id", "text"), s"$root/store", nFiles = 2)
    assert(spark.read.parquet(s"$root/store").count() == 3) // shared, old only, brand new
    Multimodal.appendBlobStore(spark,
      Multimodal.asBinary(cur, "doc_id", "text"), s"$root/store", nFiles = 2)
    assert(spark.read.parquet(s"$root/store").count() == 3, "replayed append must be a no-op")
    // pointers resolve for both the pre-existing and the new payload
    val restored = Multimodal.joinBlobs(spark, s"$root/store", ptr)
      .select(col("doc_id"), decode(col("content"), "UTF-8").as("text"))
      .as[(Long, String)].collect().toMap
    assert(restored == Map(3L -> "shared", 4L -> "brand new"))
    // the sidecar re-covers the grown file set: a point fetch still works
    val key = ptr.filter($"doc_id" === 4L).select("blob_key").as[Long].head()
    assert(Multimodal.fetchBlobs(spark, s"$root/store", Seq(key)).df.count() >= 1)
  }

  test("vacuumBlobStore drops only unreferenced blobs (refcount semantics) and serves the rest") {
    val root = java.nio.file.Files.createTempDirectory("graft_blobvac").toString
    // payload "shared" is referenced by a kept doc AND an erased doc —
    // it must survive; "dead only" is referenced only by erased docs
    val all = Seq((1L, "kept one"), (2L, "shared"), (3L, "shared"),
      (4L, "dead only")).toDF("doc_id", "text")
    val ptr = Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$root/store", nFiles = 2)
    val live = ptr.filter($"doc_id" =!= 3L && $"doc_id" =!= 4L) // erase docs 3, 4
    val (kept, dropped) = Multimodal.vacuumBlobStore(spark, s"$root/store", live, nFiles = 2)
    assert(kept == 2 && dropped == 1, s"kept=$kept dropped=$dropped") // shared survives via doc 2
    val restored = Multimodal.joinBlobs(spark, s"$root/store", live)
      .select(col("doc_id"), decode(col("content"), "UTF-8").as("text"))
      .as[(Long, String)].collect().toMap
    assert(restored == Map(1L -> "kept one", 2L -> "shared"))
    // the erased doc's pointer now dangles — reading its bytes raises
    val e = intercept[Exception](
      Multimodal.joinBlobs(spark, s"$root/store", ptr.filter($"doc_id" === 4L))
        .select(col("content")).collect())
    assert(e.getMessage.contains("missing sha"))
    // vacuum is idempotent: nothing left to drop
    assert(Multimodal.vacuumBlobStore(spark, s"$root/store", live, nFiles = 2) == ((2L, 0L)))
  }

  test("an interrupted vacuum swap recovers from directory states alone") {
    import java.nio.file.{Files => JF, Paths}
    val all = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")

    // crash BETWEEN the two renames: store gone, stage committed →
    // recovery swaps the stage in (and clears the trash)
    val r1 = JF.createTempDirectory("graft_vacrec1").toString
    val ptr1 = Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$r1/store", nFiles = 1)
    spark.read.parquet(s"$r1/store")
      .write.mode("overwrite").parquet(s"$r1/store.vacuum_tmp")
    assert(new java.io.File(s"$r1/store").renameTo(new java.io.File(s"$r1/store.vacuum_trash")))
    Multimodal.recoverVacuum(spark, s"$r1/store")
    assert(JF.exists(Paths.get(s"$r1/store")) &&
      !JF.exists(Paths.get(s"$r1/store.vacuum_tmp")) &&
      !JF.exists(Paths.get(s"$r1/store.vacuum_trash")))
    assert(Multimodal.joinBlobs(spark, s"$r1/store", ptr1)
      .select("doc_id").count() == 2)

    // crash BEFORE the stage committed, store already moved aside (a
    // hand-forced state recovery must still untangle): trash restores
    val r2 = JF.createTempDirectory("graft_vacrec2").toString
    Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$r2/store", nFiles = 1)
    assert(new java.io.File(s"$r2/store").renameTo(new java.io.File(s"$r2/store.vacuum_trash")))
    JF.createDirectory(Paths.get(s"$r2/store.vacuum_tmp")) // torn stage, no _SUCCESS
    Multimodal.recoverVacuum(spark, s"$r2/store")
    assert(JF.exists(Paths.get(s"$r2/store")) &&
      !JF.exists(Paths.get(s"$r2/store.vacuum_tmp")) &&
      !JF.exists(Paths.get(s"$r2/store.vacuum_trash")))

    // store present → any stage/trash is stale and is discarded
    val r3 = JF.createTempDirectory("graft_vacrec3").toString
    Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$r3/store", nFiles = 1)
    JF.createDirectory(Paths.get(s"$r3/store.vacuum_tmp"))
    Multimodal.recoverVacuum(spark, s"$r3/store")
    assert(JF.exists(Paths.get(s"$r3/store")) &&
      !JF.exists(Paths.get(s"$r3/store.vacuum_tmp")))
  }

  test("a crash after the swap but before the sidecar write is repaired by recovery") {
    import java.nio.file.{Files => JF, Paths}
    // the crash window: both renames done (store holds the survivors,
    // old store rode into the trash WITH its sidecar), writeBloomSidecar
    // never ran → store present, trash present, NO `_filebloom`. Before
    // the fix, recovery only tidied directories and every later point
    // fetch failed on the missing sidecar.
    val root = JF.createTempDirectory("graft_vacrec4").toString
    val all = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val ptr = Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$root/store", nFiles = 1)
    val side = new java.io.File(s"$root/store/${Layout.bloomSidecarDir}")
    assert(side.exists())
    JF.createDirectory(Paths.get(s"$root/store.vacuum_trash"))
    side.listFiles().foreach(_.delete()); assert(side.delete())
    Multimodal.recoverVacuum(spark, s"$root/store")
    assert(!JF.exists(Paths.get(s"$root/store.vacuum_trash")))
    val key = ptr.filter($"doc_id" === 1L).select("blob_key").as[Long].head()
    assert(Multimodal.fetchBlobs(spark, s"$root/store", Seq(key)).df.count() >= 1)
    // same window WITHOUT the trash (crash fell after the trash delete):
    // sidecar absence alone is the trigger
    side.listFiles().foreach(_.delete()); assert(side.delete())
    Multimodal.recoverVacuum(spark, s"$root/store")
    assert(Multimodal.fetchBlobs(spark, s"$root/store", Seq(key)).df.count() >= 1)
  }

  test("vacuum to empty refuses loudly instead of leaving an unservable store") {
    val root = java.nio.file.Files.createTempDirectory("graft_blobvac0").toString
    val all = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val ptr = Multimodal.writeBlobStore(spark,
      Multimodal.asBinary(all, "doc_id", "text"), s"$root/store", nFiles = 1)
    val e = intercept[IllegalArgumentException](Multimodal.vacuumBlobStore(
      spark, s"$root/store", ptr.filter($"doc_id" === -1L), nFiles = 1))
    assert(e.getMessage.contains("full erasure"))
    // the refused vacuum left the store fully servable
    assert(Multimodal.joinBlobs(spark, s"$root/store", ptr)
      .select("doc_id").count() == 2)
  }
}
