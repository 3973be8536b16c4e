package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * per-partition decoder reuse — is real and tested; the codec calls
  * themselves are STUBBED with deterministic fakes (this container ships
  * no image/audio libraries). Swap [[MediaCodec.decodeImageStub]] /
  * [[MediaCodec.decodeAudioStub]] for a real decoder (e.g. TwelveMonkeys
  * ImageIO / JLayer) without touching the pipeline.
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
    // coalesce: sum over zero rows is NULL, and an empty upstream filter
    // must not crash the pipeline
    val totalBytes = ds.agg(coalesce(sum(length(col("content"))), lit(0L))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).head()
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    ds.repartition(parts)
  }

  /** Decode + feature-extract, one decoder per partition (mapPartitions:
    * setup cost amortized, rows streamed). The decode itself is a
    * deterministic stub. */
  def imageFeatures(ds: Dataset[MediaRow], histogramBins: Int = 16): Dataset[ImageFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      val decoder = new MediaCodec.StubImageDecoder(histogramBins) // per-task instance
      rows.map { r =>
        val img = decoder.decode(r.content)
        ImageFeatures(r.mediaId, img.width, img.height, img.channels, img.histogram)
      }
    }
  }

  /** Sample every `stride`-th frame of a "video" blob (stub: fixed-size
    * byte windows stand in for decoded frames). flatMap shape matches a
    * real frame extractor: 0..n output rows per input row. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int, frameBytes: Int = 256): Dataset[FrameSample] = {
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
}

/** Stubbed codecs with real signatures. Every fake is deterministic in the
  * input bytes so tests and oracles are stable. */
object MediaCodec {

  import Media.MediaMeta

  /** Magic-byte sniffing (real); dimensions/rates are stub-derived. */
  def sniffMeta(bytes: Array[Byte]): MediaMeta = {
    val mediaType =
      if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "image/png"
      else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
      else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F') "audio/wav"
      else "application/octet-stream"
    MediaMeta(mediaType, bytes.length.toLong,
      width = stubDim(bytes, 0), height = stubDim(bytes, 1),
      sampleRateHz = 16000, nFrames = math.max(1, bytes.length / 256))
  }

  private def stubDim(bytes: Array[Byte], salt: Int): Int = {
    // ??? real impl: parse the container header. Deterministic fake:
    64 + (math.abs(graft.functions.TextKernels.splitmix64(
      bytes.length.toLong * 31 + salt)) % 64).toInt
  }

  case class StubImage(width: Int, height: Int, channels: Int, histogram: Array[Double])

  /** Stands in for an ImageIO/libjpeg decoder: holds per-task state
    * (reusable bin buffer) exactly like a real decoder would hold native
    * contexts. */
  final class StubImageDecoder(bins: Int) {
    private val counts = new Array[Long](bins)

    def decode(bytes: Array[Byte]): StubImage = {
      // ??? real impl: ImageIO.read + pixel scan. Deterministic fake:
      // histogram over the raw bytes.
      java.util.Arrays.fill(counts, 0L)
      var i = 0
      while (i < bytes.length) {
        counts(((bytes(i) & 0xff) * bins) / 256) += 1
        i += 1
      }
      val total = math.max(1L, bytes.length.toLong)
      val hist = counts.map(_.toDouble / total)
      val meta = sniffMeta(bytes)
      StubImage(meta.width, meta.height, channels = 3, histogram = hist)
    }
  }

  /** Stub audio decode: byte-energy per fixed window ("spectrogram"). */
  def decodeAudioStub(bytes: Array[Byte], window: Int = 128): Array[Double] = {
    val n = math.max(1, bytes.length / window)
    val out = new Array[Double](n)
    var w = 0
    while (w < n) {
      var s = 0.0
      var i = w * window
      val until = math.min(bytes.length, i + window)
      while (i < until) { s += (bytes(i) & 0xff); i += 1 }
      out(w) = s / window
      w += 1
    }
    out
  }
}
