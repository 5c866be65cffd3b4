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

  /** Magic-number pre-check for the four formats this decode surface
    * supports (PNG `\x89PNG`, JPEG `\xFF\xD8\xFF`, GIF `GIF8`, BMP `BM`).
    * `ImageIO.read` on a non-image payload walks the whole reader
    * registry (every plugin gets to sniff the stream) before giving up —
    * measured as the dominant cost of q62, where ~95% of payloads are
    * text. Four byte compares skip that search; payloads failing the
    * check take the same stub fallback a failed parse would. This gate
    * DEFINES the engine's supported image set: formats ImageIO could
    * also decode (TIFF on JDK 9+, headerless WBMP) deliberately take
    * the stub path — every decode surface (decodeImage, resizeImage,
    * pixelFeatures) and the q71 oracle replay apply the same gate, so
    * engine and oracle can never diverge on an exotic payload.
    */
  private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

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
          if (!looksLikeImage(rec.content)) null
          else
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

  /** Deterministic golden media corpus: real PNG/BMP bytes encoded
    * in-JVM with KNOWN dimensions, plus undecodable junk payloads (the
    * poison-pill path). Returns each record WITH its expected decode
    * metadata computed from the generation PARAMETERS — width/height
    * are what the encoder was told, never what a decoder read back —
    * so a query over this corpus has ground truth independent of the
    * decode path under test. q62 runs [[decodeImage]] over it against
    * a literal-VALUES DuckDB oracle built from the expected side
    * (closing round-2's one rows-only correctness hole).
    *
    * Pixels vary per (x, y, doc) so encoders emit real image data;
    * PNG re-encoding is deterministic in-process, making n_bytes and
    * checksum stable between the query run and the oracle build.
    */
  def syntheticMediaCorpus(n: Int = 24): Seq[(MediaRecord, ImageMeta)] =
    (0 until n).map { i =>
      val id = i.toLong
      if (i % 5 == 4) {
        // junk: bytes no ImageIO reader claims → expected = stub fallback
        val bytes = Array.tabulate[Byte](40 + i)(j => ((i * 31 + j * 7) % 251).toByte)
        (MediaRecord(id, bytes), stubMeta(MediaRecord(id, bytes)))
      } else {
        val w = 8 + i
        val h = 5 + (i * 3) % 17
        val argbPng = i % 4 == 2 // PNG carries alpha → 4 decoded channels
        val fmt = if (i % 2 == 0) "png" else "bmp"
        val imgType =
          if (argbPng) java.awt.image.BufferedImage.TYPE_INT_ARGB
          else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        val img = new java.awt.image.BufferedImage(w, h, imgType)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = ((x * 31 + y * 17 + i * 7) % 0xffffff) | (if (argbPng) 0xff000000 else 0)
            img.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, out)
        val bytes = out.toByteArray
        (MediaRecord(id, bytes),
          ImageMeta(id, bytes.length.toLong, w, h, if (argbPng) 4 else 3,
            checksumOf(bytes)))
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

  /** REAL resize via the JDK's Graphics2D (bilinear resample → PNG
    * re-encode — no external deps, same argument as [[decodeImage]]).
    * Output metadata describes the RESIZED ARTIFACT: n_bytes/checksum
    * over the re-encoded PNG bytes, dims = target dims, channels = what
    * the re-encoded PNG actually carries (4 if the source had alpha,
    * else 3 — so decoding the artifact agrees with its stored metadata;
    * a grayscale source is widened to RGB by the resample target).
    * Deterministic in-process (fixed interpolation, fixed encoder), so
    * pipelines can content-address resized artifacts by the checksum.
    * Undecodable payloads fall back to [[resizeStub]] semantics — one
    * stub row, not a stage retry.
    */
  def resizeImage(ds: Dataset[MediaRecord], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val src =
          if (!looksLikeImage(rec.content)) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(rec.content))
            catch { case scala.util.control.NonFatal(_) => null }
        if (src == null)
          ImageMeta(rec.doc_id, rec.content.length.toLong, w, h, 3,
            checksumOf(rec.content))
        else {
          val hasAlpha = src.getColorModel.hasAlpha
          val dstType =
            if (hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
          val dst = new java.awt.image.BufferedImage(w, h, dstType)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, w, h, null)
          } finally g.dispose()
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", out)
          val bytes = out.toByteArray
          ImageMeta(rec.doc_id, bytes.length.toLong, w, h,
            if (hasAlpha) 4 else 3, checksumOf(bytes))
        }
      }
    }
  }

  case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  private[graft] def l2Normalize(v: Array[Float]): Array[Float] = {
    var norm = 0.0
    var j = 0
    while (j < v.length) { norm += v(j).toDouble * v(j); j += 1 }
    val n = math.sqrt(norm)
    if (n > 0) { j = 0; while (j < v.length) { v(j) = (v(j) / n).toFloat; j += 1 } }
    v
  }

  /** Byte histogram folded to `dim` buckets, L2 normalized — the stub
    * feature function, also the fallback when a payload doesn't decode.
    */
  private[graft] def byteHistogram(bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      v((bytes(i) & 0xff) % dim) += 1f
      i += 1
    }
    l2Normalize(v)
  }

  /** STUB feature extraction: a deterministic fixed-length float vector
    * from the bytes ([[byteHistogram]]) — the plumbing that connects
    * binary media columns to the similarity-search path
    * (`ext.SimilaritySearch` accepts its output directly). A real
    * pipeline swaps the histogram for a model forward pass; schema,
    * batching and downstream ops are unchanged. For a feature vector
    * derived from DECODED PIXELS, use [[featureExtractPixels]].
    */
  def featureExtractStub(ds: Dataset[MediaRecord], dim: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions(it => it.map(rec => MediaFeatures(rec.doc_id, byteHistogram(rec.content, dim))))
  }

  /** Pixel-derived feature vector: decode ([[looksLikeImage]] gate +
    * `ImageIO.read`, as in [[decodeImage]]) → bilinear downsample to
    * `side`×`side` via the same Graphics2D machinery as [[resizeImage]]
    * → row-major per-pixel (R, G, B) floats → L2 normalize. Dim =
    * side·side·3. Undecodable payloads fall back to [[byteHistogram]]
    * at the same dim (one stub row, not a stage retry — same poison-
    * payload argument as decodeImage). Deterministic in-process: fixed
    * interpolation, fixed traversal order.
    */
  private[graft] def pixelFeatures(bytes: Array[Byte], side: Int): Array[Float] = {
    val dim = side * side * 3
    val src =
      if (!looksLikeImage(bytes)) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
    if (src == null) byteHistogram(bytes, dim)
    else {
      val dst = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, side, side, null)
      } finally g.dispose()
      val v = new Array[Float](dim)
      var y = 0
      var i = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val rgb = dst.getRGB(x, y)
          v(i) = ((rgb >> 16) & 0xff).toFloat
          v(i + 1) = ((rgb >> 8) & 0xff).toFloat
          v(i + 2) = (rgb & 0xff).toFloat
          i += 3
          x += 1
        }
        y += 1
      }
      l2Normalize(v)
    }
  }

  /** REAL feature extraction from decoded pixels — the
    * decode→feature→search leg of the media pipeline (q71), exercising
    * the full path a model-embedding job would take; the downsample
    * stands where the forward pass would sit.
    */
  def featureExtractPixels(ds: Dataset[MediaRecord], side: Int = 4)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions(it => it.map(rec => MediaFeatures(rec.doc_id, pixelFeatures(rec.content, side))))
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

  // ------------------------------------------------------------------
  // Perceptual hashing (q291): the image analogue of SimHash — a
  // 64-bit average hash whose hamming distance tracks visual
  // similarity, so near-dup detection over decoded media reduces to
  // the SAME banded-LSH + bounded-verify shape the text side uses.

  /** 8×8 average hash over decoded pixels, integer arithmetic only
    * (exact-replayable): per 8×8 grid block, the mean integer
    * luminance (lum = (299r + 587g + 114b) / 1000, truncating); bit i
    * set iff block i's mean exceeds the mean of the 64 block means.
    */
  def aHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        sums(by * 8 + bx) += lum
        cnts(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => sums(i) / math.max(cnts(i), 1L))
    val avg = means.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > avg) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Fallback hash for undecodable payloads — the content checksum
    * spread over all four 16-bit bands (the raw checksum is < 2^30, so
    * without the spread every junk payload would share band keys 2/3
    * and the LSH bucket join would degenerate). SQL replay:
    * `xor(c << 32, (c * c) % 1000000007)` with c = the PolyHash
    * checksum (ASCII payloads: == PolyHash of the text, see q62).
    */
  def stubHash64(bytes: Array[Byte]): Long = {
    val c = checksumOf(bytes)
    (c << 32) ^ ((c * c) % 1000000007L)
  }

  case class ImageHash(doc_id: Long, ahash: Long)

  /** Decode + perceptual-hash in one per-partition pass (the q62
    * decode path feeding [[aHash64]]; undecodable → [[stubHash64]]).
    */
  def aHashImages(ds: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img =
          if (!looksLikeImage(rec.content)) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(rec.content))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageHash(rec.doc_id, stubHash64(rec.content))
        else ImageHash(rec.doc_id, aHash64(img))
      }
    }
  }

  /** Near-dup golden corpus for the perceptual-hash gate: `nGroups`
    * visually distinct 64×64 block patterns (each 8×8 block uniform
    * gray, dark 50 / bright 200 — block means sit ±75 from the global
    * average, so single-block edits can never flip OTHER blocks'
    * bits), three variants per group differing by one flipped block →
    * in-group hamming ≤ 2, cross-group ~32. Returns each record with
    * its expected [[aHash64]] computed from the generation parameters
    * (pure integer arithmetic on the block pattern — ground truth
    * independent of the PNG encode/decode round-trip under test).
    */
  def syntheticPhashCorpus(nGroups: Int = 12): Seq[(MediaRecord, Long, Int)] =
    (0 until nGroups).flatMap { g =>
      (0 until 3).map { v =>
        val id = (g * 3 + v).toLong
        // base pattern: block (bx, by) bright iff a mid bit of a
        // xorshift-multiplied mix is set (a LINEAR mix mod 2 collapses
        // to parity-of-g — every other group shares one pattern — so
        // the mix must be nonlinear; measured: in-group hamming <= 2,
        // cross-group >= 18 over all 630 pairs); variant v>0 flips
        // block (v, v)
        def bright(bx: Int, by: Int): Boolean = {
          var m = g * 2654435761L + bx * 97L + by * 1009L + 12345L
          m = (m ^ (m >>> 13)) * 2654435761L
          val base = ((m >>> 31) & 1L) == 1L
          if (v > 0 && bx == v && by == v) !base else base
        }
        val img = new java.awt.image.BufferedImage(
          64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 64; x <- 0 until 64) {
          val l = if (bright(x / 8, y / 8)) 200 else 50
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        // expected hash from the generation parameters: uniform gray
        // blocks have mean luminance exactly 50 or 200 (299+587+114 =
        // 1000, so lum == the gray level)
        val means = Array.tabulate(64)(i =>
          if (bright(i % 8, i / 8)) 200L else 50L)
        val avg = means.sum / 64
        var hash = 0L
        for (i <- 0 until 64) if (means(i) > avg) hash |= (1L << i)
        (MediaRecord(id, bos.toByteArray), hash, g)
      }
    }
}
