package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star op): image/audio/video content
  * as opaque `binary` columns with typed metadata, processed by
  * batch-oriented per-partition functions.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libs): [[decodeImageStub]] derives deterministic fake metadata from the
  * bytes. Everything around the stub — the binary column schema, the
  * `mapPartitions` batch shape (one iterator per partition, the Scala
  * analogue of `mapInPandas` batches), partitioning behavior, and the
  * typed output schema — is real and tested, so swapping in a real codec
  * is a one-function change.
  *
  * Scale notes: binary payloads ride parquet's byte-array encoding; the
  * per-partition function streams (never materializes a partition);
  * metadata-only consumers should select the struct columns so column
  * pruning drops the bytes at the scan.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, content: Array[Byte])
  case class ImageMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       channels: Int, checksum: Long)
  case class Frame(idx: Int, offset: Long, length: Long, checksum: Long)
  case class VideoFrames(doc_id: Long, n_frames: Int, frames: Seq[Frame])

  /** Attach an opaque binary content column (here derived from text — the
    * fixtures carry no real media; a real pipeline reads files/blobs).
    */
  def withBinaryContent(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))

  private def checksumOf(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    acc
  }

  /** STUB decode: deterministic fake image metadata from the bytes.
    * Batch shape: one call per partition, streaming iterator in/out —
    * exactly where a real `ImageIO.read`/libvips call would sit.
    */
  def decodeImageStub(ds: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val n = rec.content.length.toLong
        ImageMeta(
          doc_id = rec.doc_id,
          n_bytes = n,
          width = (1 + n % 640).toInt,
          height = (1 + (n * 31) % 480).toInt,
          channels = 3,
          checksum = checksumOf(rec.content))
      }
    }
  }

  /** STUB frame sampler ("video" → n byte-range frames with checksums):
    * the plumbing for per-frame feature extraction.
    */
  def sampleFramesStub(ds: Dataset[MediaRecord], nFrames: Int)(
      implicit spark: SparkSession): Dataset[VideoFrames] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val n = rec.content.length
        val k = math.min(nFrames, math.max(n, 1))
        val frames = (0 until k).map { i =>
          val start = i * n / k
          val end = (i + 1) * n / k
          Frame(i, start.toLong, (end - start).toLong,
            checksumOf(rec.content.slice(start, end)))
        }
        VideoFrames(rec.doc_id, k, frames)
      }
    }
  }

  /** SQL-expressible metadata projection (no stub involved) — binary
    * length, content hash, fake decode dims — used by the oracle query.
    */
  def imageMetaSql(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      octet_length(col("content")).cast("long").as("n_bytes"),
      sha2(col("content"), 256).as("sha"),
      (lit(1) + octet_length(col("content")) % 640).cast("long").as("width"),
      (lit(1) + (octet_length(col("content")).cast("long") * 31) % 480).cast("long").as("height"))
}
