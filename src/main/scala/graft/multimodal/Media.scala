package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * per-partition decoder reuse — is real and tested. Decoding is REAL for
  * the formats the JDK ships codecs for (PNG/JPEG/BMP/GIF via
  * `javax.imageio`, plus header parses for PNG IHDR / JPEG SOF / WAV fmt);
  * payloads no JDK codec accepts fall back to a clearly-marked
  * deterministic stub so synthetic test corpora stay stable. Swap the
  * fallback for e.g. TwelveMonkeys/JLayer without touching the pipeline.
  *
  * Scale design:
  *  - Media rows are large (MBs). `targetPartitionBytes` drives an
  *    explicit `repartition` so a partition holds a bounded number of
  *    blobs — at 100 TB the same computation sizes partitions off
  *    `sum(n_bytes)` instead of file count, keeping executor memory flat.
  *  - Decoding runs in `mapPartitions`: one decoder instance per task,
  *    streamed row-by-row (no per-row setup, no whole-partition
  *    materialization).
  *  - Feature vectors come back as fixed-width arrays — column-pruned and
  *    predicate-pushed like any other column, joinable against the ANN
  *    operators in [[graft.operators.Ann]].
  */
object Media {

  /** Typed metadata carried alongside every blob. */
  case class MediaMeta(mediaType: String, nBytes: Long, width: Int, height: Int,
      sampleRateHz: Int, nFrames: Int)

  case class MediaRow(mediaId: Long, content: Array[Byte], meta: MediaMeta)

  case class ImageFeatures(mediaId: Long, width: Int, height: Int,
      channels: Int, histogram: Array[Double])

  case class FrameSample(mediaId: Long, frameIdx: Int, frameBytes: Array[Byte])
  case class MjpegFrame(mediaId: Long, frameIdx: Int, frameBytes: Array[Byte],
      width: Int, height: Int, realDecode: Boolean)

  /** Attach a media schema to a raw (id, bytes) DataFrame: computes sizes
    * and stamps metadata. Header sniffing is the only "decode" here. */
  def withMetadata(df: DataFrame, idCol: String, bytesCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("mediaId"), col(bytesCol).as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        MediaRow(id, bytes, MediaCodec.sniffMeta(bytes))
      }
  }

  /** Repartition so each partition carries ~targetPartitionBytes of blob
    * payload — the lever that keeps tasks memory-bounded when rows are
    * megabytes, independent of row count. */
  def sizePartitions(ds: Dataset[MediaRow], targetPartitionBytes: Long): Dataset[MediaRow] = {
    require(targetPartitionBytes > 0,
      s"targetPartitionBytes must be positive (got $targetPartitionBytes): " +
        "division by zero saturates to an Int.MaxValue-partition shuffle")
    // coalesce: sum over zero rows is NULL, and an empty upstream filter
    // must not crash the pipeline
    val totalBytes = ds.agg(coalesce(sum(length(col("content"))), lit(0L))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).head()
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    ds.repartition(parts)
  }

  /** Decode + feature-extract, one decoder per partition (mapPartitions:
    * setup cost amortized, rows streamed). Real ImageIO decode for
    * PNG/JPEG/BMP/GIF; deterministic stub histogram otherwise. */
  def imageFeatures(ds: Dataset[MediaRow], histogramBins: Int = 16): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      val decoder = new MediaCodec.ImageDecoder(histogramBins) // per-task instance
      rows.map { r =>
        val img = decoder.decode(r.content)
        ImageFeatures(r.mediaId, img.width, img.height, img.channels, img.histogram)
      }
    }
  }

  case class AHash(mediaId: Long, ahash: Long, realDecode: Boolean)

  /** Per-image 64-bit [[MediaCodec.aHash64 average-hash]] — feed the
    * result into [[graft.operators.Dedup.hammingPairs64]] (banded
    * Hamming candidates + exact popcount refine) for image near-dup
    * detection at corpus scale: the decode is the only heavy step and
    * runs map-only here; everything after operates on 8-byte
    * fingerprints, never pixels. Same mapPartitions/streamed-rows
    * contract as [[imageFeatures]]. */
  def imageAHash(ds: Dataset[MediaRow]): Dataset[AHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (h, real) = MediaCodec.aHash64(r.content)
        AHash(r.mediaId, h, real)
      }
    }
  }

  case class ResizedImage(mediaId: Long, width: Int, height: Int,
      png: Array[Byte], realDecode: Boolean)

  /** Resize image blobs to `maxDim` on the long side (aspect preserved,
    * never upscaled), re-encoded as PNG — REAL decode/scale/encode via
    * `javax.imageio` + `java.awt` bilinear draw for the JDK-codec formats;
    * payloads ImageIO rejects pass through byte-truncated with
    * `realDecode = false` so the pipeline shape (one row in, one row out,
    * bounded output bytes) holds for any corpus. Same mapPartitions
    * contract as [[imageFeatures]]: per-task decoder state, streamed rows;
    * pair with [[sizePartitions]] to keep task memory flat at scale. */
  def resizeImages(ds: Dataset[MediaRow], maxDim: Int): Dataset[ResizedImage] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaCodec.resizePng(r.content, maxDim) match {
          case Some((w, h, png)) => ResizedImage(r.mediaId, w, h, png, realDecode = true)
          case None =>
            // long arithmetic: maxDim² overflows Int from maxDim = 46341
            val keep = math.min(r.content.length.toLong,
              maxDim.toLong * maxDim).toInt
            ResizedImage(r.mediaId, -1, -1,
              java.util.Arrays.copyOf(r.content, keep), realDecode = false)
        }
      }
    }
  }

  /** Sample every `stride`-th frame of a "video" blob. NO CODEC DECODE
    * happens here: this container ships no video codec, so the "frames"
    * are deterministic fixed-size byte windows of the raw blob — the
    * Spark-side plumbing (flatMap shape, 0..n output rows per input row,
    * byte-budget partition sizing) is real and what a codec-backed
    * extractor would drop into; the pixel bytes are not. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int, frameBytes: Int = 256): Dataset[FrameSample] = {
    require(stride > 0, s"stride must be positive (got $stride): 0 crashes " +
      "the range step inside every task, negative silently drops all frames")
    require(frameBytes > 0, s"frameBytes must be positive (got $frameBytes)")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val n = math.max(1, r.content.length / frameBytes)
      (0 until n by stride).map { i =>
        val from = i * frameBytes
        val until = math.min(r.content.length, from + frameBytes)
        FrameSample(r.mediaId, i, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** REAL frame extraction for Motion-JPEG streams. An MJPEG blob is a
    * concatenation of baseline JPEGs; [[MediaCodec.mjpegFrames]] finds
    * each frame's SOI (FFD8FF) .. EOI (FFD9) byte span — actual
    * codec-level container structure — and every `stride`-th frame is
    * emitted with its REAL JPEG bytes plus the ImageIO-decoded
    * dimensions (`realDecode = true` only when the JDK decoder accepts
    * the frame). Blobs with no JPEG structure fall back to the
    * byte-window shape of [[sampleFrames]] (`realDecode = false`,
    * dims -1) so a mixed corpus never drops rows. Same flatMap /
    * per-task-decoder contract as the image operators; pair with
    * [[sizePartitions]] for flat task memory.
    *
    * Known limitation (documented, not silent): a raw FFD9 inside an
    * embedded EXIF thumbnail would end a frame early; MJPEG frames are
    * baseline JPEGs without thumbnails, and a mis-split frame reports
    * `realDecode = false` rather than decoding wrongly. */
  def sampleFramesMjpeg(ds: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 256): Dataset[MjpegFrame] = {
    require(stride > 0, s"stride must be positive (got $stride)")
    require(frameBytes > 0, s"frameBytes must be positive (got $frameBytes)")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val spans = MediaCodec.mjpegFrames(r.content)
      if (spans.nonEmpty) {
        spans.indices.by(stride).map { i =>
          val (from, until) = spans(i)
          val bytes = java.util.Arrays.copyOfRange(r.content, from, until)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img != null && img.getWidth > 0)
            MjpegFrame(r.mediaId, i, bytes, img.getWidth, img.getHeight,
              realDecode = true)
          else MjpegFrame(r.mediaId, i, bytes, -1, -1, realDecode = false)
        }
      } else {
        val n = math.max(1, r.content.length / frameBytes)
        (0 until n by stride).map { i =>
          val from = i * frameBytes
          val until = math.min(r.content.length, from + frameBytes)
          MjpegFrame(r.mediaId, i,
            java.util.Arrays.copyOfRange(r.content, from, until), -1, -1,
            realDecode = false)
        }
      }
    }
  }
}

/** Real JDK codecs where they exist, deterministic fallbacks elsewhere.
  * Every fallback is deterministic in the input bytes so tests and
  * oracles are stable. */
object MediaCodec {

  import Media.MediaMeta

  /** Magic-byte sniffing plus REAL container-header parses: PNG IHDR
    * width/height (big-endian ints at offsets 16/20), JPEG SOF frame
    * dimensions, WAV fmt-chunk sample rate. Implausible or truncated
    * headers fall back to stub-derived dimensions. */
  def sniffMeta(bytes: Array[Byte]): MediaMeta = {
    val mediaType =
      if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "image/png"
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "audio/wav"
      else "application/octet-stream"
    val (w, h) = mediaType match {
      case "image/png" if bytes.length >= 24 =>
        val pw = beInt(bytes, 16); val ph = beInt(bytes, 20)
        if (plausibleDim(pw) && plausibleDim(ph)) (pw, ph) else stubDims(bytes)
      case "image/jpeg" => jpegDims(bytes).getOrElse(stubDims(bytes))
      case _ => stubDims(bytes)
    }
    val rate = mediaType match {
      case "audio/wav" => wavSampleRate(bytes).getOrElse(16000)
      case _ => 16000
    }
    MediaMeta(mediaType, bytes.length.toLong, width = w, height = h,
      sampleRateHz = rate, nFrames = math.max(1, bytes.length / 256))
  }

  private def plausibleDim(d: Int): Boolean = d > 0 && d <= (1 << 16)

  /** Walk RIFF chunks to the 'fmt ' chunk and read its sample-rate field
    * (bytes 4-7 of the chunk data) — files with JUNK/LIST chunks before
    * fmt would otherwise read a plausible-but-wrong rate from a fixed
    * offset. None when fmt is absent, truncated, or implausible. */
  private def wavSampleRate(b: Array[Byte]): Option[Int] = {
    // long cursor: a corrupt declared chunk length near Int.MaxValue would
    // wrap an Int cursor negative and crash the bounds check
    var i = 12L // past "RIFF"<size>"WAVE"
    while (i + 8 <= b.length) {
      val j = i.toInt
      val isFmt = b(j) == 'f' && b(j + 1) == 'm' && b(j + 2) == 't' && b(j + 3) == ' '
      val len = leInt(b, j + 4)
      if (isFmt) {
        // the fmt chunk itself must DECLARE room for the rate field at
        // data offset 4..7 — an array-bound check alone would read the
        // next chunk's bytes through a short fmt chunk
        return if (len >= 8 && i + 8 + 8 <= b.length) {
          val r = leInt(b, j + 8 + 4)
          if (r > 0 && r <= 384000) Some(r) else None
        } else None
      }
      if (len < 0) return None // corrupt chunk length: stop walking
      i += 8L + len + (len & 1) // chunks are word-aligned
    }
    None
  }

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Walk JPEG markers to the first SOF0/1/2/3 frame header → (w, h). */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (marker >= 0xc0 && marker <= 0xc3) {
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        return if (plausibleDim(w) && plausibleDim(h)) Some((w, h)) else None
      }
      i += 2 + len
    }
    None
  }

  private def stubDims(bytes: Array[Byte]): (Int, Int) =
    (stubDim(bytes, 0), stubDim(bytes, 1))

  private def stubDim(bytes: Array[Byte], salt: Int): Int = {
    // deterministic fake for payloads with no parseable header
    64 + (math.abs(graft.functions.TextKernels.splitmix64(
      bytes.length.toLong * 31 + salt)) % 64).toInt
  }

  /** Byte spans [start, end) of the JPEG frames in a Motion-JPEG
    * stream: each frame runs from an SOI-plus-marker prefix (FFD8FF —
    * the extra FF rejects random FFD8 pairs in non-JPEG data) to its
    * EOI (FFD9) inclusive. Within entropy-coded scan data 0xFF bytes
    * are escaped (FF00) or restart markers (FFD0-D7), so a raw FFD9 is
    * the frame end for baseline thumbnail-free JPEGs — the MJPEG frame
    * format. Returns empty for blobs with no JPEG structure. */
  def mjpegFrames(bytes: Array[Byte]): IndexedSeq[(Int, Int)] = {
    val out = IndexedSeq.newBuilder[(Int, Int)]
    var i = 0
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8 &&
          (bytes(i + 2) & 0xff) == 0xff) {
        var j = i + 2
        var end = -1
        while (j + 1 < bytes.length && end < 0) {
          if ((bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xd9)
            end = j + 2
          j += 1
        }
        if (end > 0) { out += ((i, end)); i = end }
        else i = bytes.length // truncated trailing frame: drop, stop scan
      } else i += 1
    }
    out.result()
  }

  /** Decode, bilinear-scale to `maxDim` on the long side (no upscaling),
    * re-encode PNG. None when ImageIO has no codec for the payload. */
  def resizePng(bytes: Array[Byte], maxDim: Int): Option[(Int, Int, Array[Byte])] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      val (w, h) = (math.max(1, math.round(img.getWidth * scale).toInt),
        math.max(1, math.round(img.getHeight * scale).toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", buf)
      Some((w, h, buf.toByteArray))
    }
  }

  /** 64-bit average-hash (aHash) of an image: luminance means over an
    * 8×8 cell grid, bit (r,c) = cell mean STRICTLY above the global
    * mean, bit index `r*8 + c` from the LSB. The classic cheap
    * perceptual fingerprint — stable under re-encode/resize, so equal
    * or near-equal hashes flag visually duplicate images.
    *
    * Exactness: cell-vs-global mean comparisons are INTEGER
    * cross-multiplications (`cellSum·totalCnt > totalSum·cellCnt`) —
    * no floating point, no rounding law needed, any engine replaying
    * the construction reproduces the hash bit-for-bit. Images larger
    * than 2^24 sampled pixels are stride-subsampled (deterministic
    * stride from dimensions) to keep the products inside Long range.
    * Payloads ImageIO rejects fall back to the same law over the RAW
    * BYTES as a 1×n luminance strip split into 64 chunks — the
    * documented deterministic stub path, shape-preserving for
    * synthetic corpora. */
  def aHash64(bytes: Array[Byte]): (Long, Boolean) = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img != null && img.getWidth >= 8 && img.getHeight >= 8) {
      val w = img.getWidth
      val h = img.getHeight
      // stride keeps sampled pixels <= 2^24 so the cross-products fit
      val stride = {
        var s = 1
        while ((w.toLong / s) * (h.toLong / s) > (1L << 24)) s += 1
        s
      }
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val r = y * 8 / h
        var x = 0
        while (x < w) {
          val c = x * 8 / w
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          sums(r * 8 + c) += lum
          cnts(r * 8 + c) += 1
          x += stride
        }
        y += stride
      }
      (hashFromCells(sums, cnts), true)
    } else {
      val n = math.max(1, bytes.length)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var i = 0
      while (i < bytes.length) {
        val cell = math.min(63, (i.toLong * 64 / n).toInt)
        sums(cell) += (bytes(i) & 0xff)
        cnts(cell) += 1
        i += 1
      }
      (hashFromCells(sums, cnts), false)
    }
  }

  private def hashFromCells(sums: Array[Long], cnts: Array[Long]): Long = {
    var totalSum = 0L
    var totalCnt = 0L
    var i = 0
    while (i < 64) { totalSum += sums(i); totalCnt += cnts(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      // empty cells (cnt 0) stay 0: 0 > totalSum * 0 = 0 is false
      if (sums(i) * totalCnt > totalSum * cnts(i)) hash |= 1L << i
      i += 1
    }
    hash
  }

  case class DecodedImage(width: Int, height: Int, channels: Int,
      histogram: Array[Double], realDecode: Boolean)

  /** Image decoder: REAL `javax.imageio` decode (PNG/JPEG/BMP/GIF ship
    * with the JDK) producing true dimensions, channel count, and a
    * normalized luminance histogram. Payloads ImageIO rejects fall back
    * to a deterministic byte histogram (realDecode = false). Holds
    * per-task reusable buffers, instantiated once per partition. */
  final class ImageDecoder(bins: Int) {
    private val counts = new Array[Long](bins)

    def decode(bytes: Array[Byte]): DecodedImage = {
      java.util.Arrays.fill(counts, 0L)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            counts((lum * bins) / 256) += 1
            x += 1
          }
          y += 1
        }
        val total = img.getWidth.toLong * img.getHeight
        DecodedImage(img.getWidth, img.getHeight,
          channels = img.getColorModel.getNumComponents,
          histogram = counts.map(_.toDouble / total), realDecode = true)
      } else {
        var i = 0
        while (i < bytes.length) {
          counts(((bytes(i) & 0xff) * bins) / 256) += 1
          i += 1
        }
        val total = math.max(1L, bytes.length.toLong)
        val meta = sniffMeta(bytes)
        DecodedImage(meta.width, meta.height, channels = 3,
          histogram = counts.map(_.toDouble / total), realDecode = false)
      }
    }
  }

  /** Audio decode: REAL `javax.sound.sampled` path for WAV/AIFF/AU (the
    * formats the JDK ships providers for) — frames are decoded to 16-bit
    * PCM, mono-mixed, and reduced to per-window RMS energy in [0, 1].
    * Payloads the JDK cannot read fall back to [[decodeAudioStub]]. */
  def decodeAudio(bytes: Array[Byte], window: Int = 128): Array[Double] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val target = new javax.sound.sampled.AudioFormat(
        ais.getFormat.getSampleRate, 16, ais.getFormat.getChannels, true, false)
      val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
      val raw = pcm.readAllBytes()
      val ch = target.getChannels
      val nSamples = raw.length / (2 * ch)
      val mono = new Array[Double](nSamples)
      var i = 0
      while (i < nSamples) {
        var s = 0.0
        var c = 0
        while (c < ch) {
          val off = (i * ch + c) * 2
          s += ((raw(off) & 0xff) | (raw(off + 1) << 8)).toShort.toDouble / 32768.0
          c += 1
        }
        mono(i) = s / ch
        i += 1
      }
      // ceil: the trailing partial window still contributes (normalized by
      // its actual sample count), so no tail of the clip is dropped
      val nWin = math.max(1, (nSamples + window - 1) / window)
      Array.tabulate(nWin) { w =>
        var acc = 0.0
        var j = w * window
        val until = math.min(nSamples, j + window)
        while (j < until) { acc += mono(j) * mono(j); j += 1 }
        math.sqrt(acc / math.max(1, until - w * window))
      }
    } catch {
      case _: Exception => decodeAudioStub(bytes, window)
    }

  /** Deterministic fallback: byte-energy per window; the trailing partial
    * window is kept and normalized by its actual byte count. */
  def decodeAudioStub(bytes: Array[Byte], window: Int = 128): Array[Double] = {
    val n = math.max(1, (bytes.length + window - 1) / window)
    val out = new Array[Double](n)
    var w = 0
    while (w < n) {
      var s = 0.0
      var i = w * window
      val until = math.min(bytes.length, i + window)
      while (i < until) { s += (bytes(i) & 0xff); i += 1 }
      out(w) = s / math.max(1, until - w * window)
      w += 1
    }
    out
  }
}
