package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque binary columns with typed
  * metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real — binary column, partition-parallel
  * decode, typed output schema — while the codec itself is a
  * deterministic STUB (this environment ships no image/audio libraries).
  * Swapping `stubDecode` for an actual JNI/library call changes nothing
  * in the plan: mapPartitions keeps the decoder amortized per batch, and
  * the binary payload never passes through a shuffle (decode before
  * aggregation, project metadata only).
  */
object Multimodal {

  /** Typed decode output — what a real image decoder would yield. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, frames: Int)

  /** Treat text as the opaque media payload (binary). In production this
    * column arrives as real bytes (image/audio) from parquet/object store. */
  def asBinary(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id).cast("long").as("doc_id"),
      encode(col(payload), "UTF-8").as("content"))

  /** Deterministic fake decode: metadata derived purely from the bytes,
    * so tests/oracles can verify the plumbing end-to-end. A real decoder
    * (???) would parse headers here. */
  private[operators] def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val fmt = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    MediaMeta(id, n, fmt, width = 16 + (n % 64), height = 16 + (n % 48),
      frames = 1 + (n % 4))
  }

  /** Partition-parallel decode: one iterator pass per partition, typed
    * output. This is the Scala analog of mapInPandas batch decode. */
  def decodeMeta(spark: SparkSession, bin: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    bin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
  }

  /** Deterministic frame sampling: pick every k-th frame index — shape of
    * a video frame-sampler, emitting (doc_id, frame_idx) rows. */
  def sampleFrames(spark: SparkSession, meta: Dataset[MediaMeta], everyK: Int): DataFrame = {
    import spark.implicits._
    meta.flatMap(m => (0 until m.frames by everyK).map(f => (m.doc_id, f)))
      .toDF("doc_id", "frame_idx")
  }

  /** Resize stub: aspect-preserving fit into a bounding box — the pure
    * geometry a real resampler shares; only the pixel pass is faked. */
  def resizeMeta(spark: SparkSession, meta: Dataset[MediaMeta],
                 maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import spark.implicits._
    meta.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** Feature-extraction stub: a real model would run per batch here
    * (that's why this is mapPartitions — weights load once per
    * partition, not per row); the fake embeds byte statistics into a
    * fixed-dim vector, deterministically. */
  def extractFeatures(spark: SparkSession, bin: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    bin.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "model load" would happen here
        it.map { case (id, bytes) =>
          val v = Array.tabulate(dim) { d =>
            if (bytes.isEmpty) 0f
            else {
              var s = 0
              var i = d
              while (i < bytes.length) { s += bytes(i) & 0xff; i += dim }
              (s % 1000) / 1000.0f
            }
          }
          (id, v)
        }
      }.toDF("doc_id", "features")
  }
}
