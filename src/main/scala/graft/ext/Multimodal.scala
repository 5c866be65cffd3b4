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

  private def stubMeta(rec: MediaRecord): ImageMeta = {
    val n = rec.content.length.toLong
    ImageMeta(
      doc_id = rec.doc_id,
      n_bytes = n,
      width = (1 + n % 640).toInt,
      height = (1 + (n * 31) % 480).toInt,
      channels = 3,
      checksum = checksumOf(rec.content))
  }

  /** STUB decode: deterministic fake image metadata from the bytes.
    * Batch shape: one call per partition, streaming iterator in/out —
    * exactly where a real `ImageIO.read`/libvips call would sit.
    */
  def decodeImageStub(ds: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    ds.mapPartitions(it => it.map(stubMeta))
  }

  /** REAL image decode via the JDK's `javax.imageio` registry (PNG, BMP,
    * GIF, JPEG — no external deps), in the same mapPartitions batch shape
    * as the stub. Payloads ImageIO can't parse fall back to [[stubMeta]],
    * so mixed/dirty corpora decode what they can instead of failing the
    * job — at 100 TB a poison payload must cost one fallback row, not a
    * stage retry loop.
    */
  def decodeImage(ds: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        // NonFatal, not just IOException: ImageIO plugin readers throw
        // IllegalArgumentException / ArrayIndexOutOfBounds etc. on
        // malformed payloads whose header passed format detection
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.content))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) stubMeta(rec)
        else ImageMeta(
          doc_id = rec.doc_id,
          n_bytes = rec.content.length.toLong,
          width = img.getWidth,
          height = img.getHeight,
          channels = img.getColorModel.getNumComponents,
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

  /** STUB resize: deterministic fake downsample — new dims + a checksum
    * over the byte range a real resampler would read. The batch shape
    * (mapPartitions streaming) is where libvips/Pillow would sit.
    */
  def resizeStub(ds: Dataset[MediaRecord], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        ImageMeta(rec.doc_id, rec.content.length.toLong, w, h, 3,
          checksumOf(rec.content))
      }
    }
  }

  case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  /** STUB feature extraction: a deterministic fixed-length float vector
    * from the bytes (byte histogram folded to `dim` buckets, L2
    * normalized) — the plumbing that connects binary media columns to
    * the similarity-search path (`ext.SimilaritySearch` accepts its
    * output directly). A real pipeline swaps the histogram for a model
    * forward pass; schema, batching and downstream ops are unchanged.
    */
  def featureExtractStub(ds: Dataset[MediaRecord], dim: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < rec.content.length) {
          v((rec.content(i) & 0xff) % dim) += 1f
          i += 1
        }
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
        val n = math.sqrt(norm)
        if (n > 0) { j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
        MediaFeatures(rec.doc_id, v)
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
