package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing: pre-shuffle a fact table ONCE at write time
  * so every later equi-join/aggregation on the bucket key runs with NO
  * exchange — the single biggest repeated-cost lever for a 100 TB table
  * that is joined on the same key by many downstream jobs (Spark reads
  * each bucket as one partition and plans a zero-shuffle sort-merge join
  * when both sides are bucketed the same way).
  *
  * Uses the catalog (`saveAsTable`) because Spark's bucketing metadata
  * lives there — a plain parquet path write silently drops bucket specs.
  */
object BucketedTable {

  /** Write `df` as a catalog table bucketed (and sorted) by `key` into
    * `numBuckets` buckets, replacing any existing table of that name.
    * The input is repartitioned by the key FIRST: each write task then
    * holds exactly one bucket's rows, so the table is one sorted file
    * per bucket — without this, every input partition writes a file per
    * bucket it touches (up to inputPartitions × numBuckets small files)
    * and sortBy only holds per file, forcing a re-sort at read time. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. The plan this
    * produces is the point: with matching bucket counts there is no
    * Exchange on either side (assert it in tests / plan audits). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
