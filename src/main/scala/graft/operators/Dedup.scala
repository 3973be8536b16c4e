package graft.operators

import graft.functions.GeoFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Scale design (100 TB / 1000 executors):
  *  - Exact dedup is a single hash-aggregate: one shuffle keyed by the
  *    content hash, map-side partial aggregation, no data skew beyond the
  *    duplicate distribution itself.
  *  - MinHash-LSH emits `bands` rows per document (band id + bucket key),
  *    shuffles once on the bucket key, and self-joins only WITHIN buckets
  *    — candidate generation is linear in Σ bucket² instead of n². Bucket
  *    keys are 64-bit hashes of 4-row signature slices; huge buckets
  *    (degenerate content) can be capped upstream by filtering
  *    `count > maxBucket`.
  *  - SimHash near-dup uses band-rotation on the 64-bit hash (4×16-bit
  *    bands): pairs within Hamming distance <= 3 share at least one band,
  *    so the same bucket-join pattern applies.
  */
object Dedup {

  /** Exact dedup: one row per distinct content hash with the lowest id as
    * the canonical survivor and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Rows of (band, bucket) per document — the LSH scatter phase.
    * numHashes must be divisible by bands; each bucket key hashes
    * `numHashes / bands` signature entries. */
  def minhashBuckets(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    df.select(col(idCol).as("doc"), minhash_sig(col(textCol), lit(numHashes)).as("sig"))
      .select(col("doc"), posexplode(sliceBands(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  private def sliceBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      // 64-bit bucket key per band: xxhash over the band's signature slice
      xxhash64(slice(sig, b * rows + 1, rows))
    }: _*)

  /** Candidate near-duplicate pairs from LSH bucket collisions (distinct
    * across bands). One shuffle on (band, bucket); joins happen only
    * within buckets. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val b = minhashBuckets(df, idCol, textCol, numHashes, bands)
    b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("ida"), col("b.doc").as("idb"))
      .distinct()
  }

  /** LSH candidates refined by exact token-set Jaccard >= threshold.
    * The refine join touches only candidate ids — at scale, broadcast the
    * (usually small) candidate set against the corpus. */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands)
    val toks = df.select(col(idCol).as("doc"),
      array_distinct(split(col(textCol), " ")).as("toks"))
    cands
      .join(toks.withColumnRenamed("doc", "ida").withColumnRenamed("toks", "ta"), "ida")
      .join(toks.withColumnRenamed("doc", "idb").withColumnRenamed("toks", "tb"), "idb")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("uni", size(col("ta")) + size(col("tb")) - col("inter"))
      .where(col("inter").cast("double") / col("uni") >= threshold)
      .select(col("ida"), col("idb"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  /** SimHash pairs within a Hamming-distance radius, found via `bands`
    * equal bit-slices of the 64-bit hash: by pigeonhole, any pair with
    * hamming <= bands-1 shares at least one band, so the bucket join is
    * complete for maxHamming <= bands-1 (default 4 bands → radius 3). */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sh = df.select(col(idCol).as("doc"), simhash64(col(textCol)).as("sh"))
    val banded = sh.select(col("doc"), col("sh"), posexplode(array(
      (0 until bands).map(b => shiftrightunsigned(col("sh"), b * width).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("ida"), col("b.doc").as("idb"),
        hamming64(col("a.sh"), col("b.sh")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
