package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Sharded JSONL (one JSON object per line) with a schema-carrying
  * manifest — the interchange format training pipelines actually speak
  * (corpus drops, tokenizer inputs, eval sets all move as *.jsonl).
  *
  * Built entirely on the public Spark json source; what this adds over
  * a bare `df.write.json` is the HANDOFF CONTRACT:
  *  - `_jsonl_manifest.json` records the exact schema as DDL plus every
  *    shard's name and byte size. Readers parse with the RECORDED
  *    schema instead of inference — schema drift (a shard of all-null
  *    columns, a numeric column inferred as string) is the classic
  *    silent JSONL interop failure.
  *  - [[read]] validates the directory against the manifest (missing /
  *    extra / size-changed shards fail LOUDLY before any row is read) —
  *    a partially-copied corpus drop must not quietly become a smaller
  *    corpus.
  *
  * Scale notes: shards split by line like any text source, so a 100 TB
  * drop parallelizes natively; `maxRecordsPerShard` bounds shard sizes
  * through the writer's own maxRecordsPerFile (no repartition — the
  * writer splits within tasks); gzip shards are NOT splittable, so
  * compression defaults to none (use zstd/snappy-compressed parquet for
  * internal hops; JSONL is for the boundary). Manifest validation reads
  * only the file listing, never data. */
object JsonlDocs {

  val ManifestName = "_jsonl_manifest.json"

  /** Write `df` as JSONL shards plus the manifest; returns shard count. */
  def write(df: DataFrame, dir: String, maxRecordsPerShard: Long = 0L): Int = {
    val spark = df.sparkSession
    val w = df.write.mode("overwrite")
    (if (maxRecordsPerShard > 0) w.option("maxRecordsPerFile", maxRecordsPerShard)
     else w).json(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val filesJson = shards.map { case (n, b) => s"""{"name":${jq(n)},"bytes":$b}""" }
      .mkString("[", ",", "]")
    val manifest =
      s"""{"format":"jsonl","schema_ddl":${jq(df.schema.toDDL)},"files":$filesJson}"""
    graft.util.FsIO.writeStringAtomic(spark, new Path(dir, ManifestName), manifest)
    shards.length
  }

  /** Exact inverse of jq(): handles the three escape classes it emits
    * (`\"`, `\\`, and `\uXXXX` for control characters) — so a schema
    * DDL or shard name containing a control character round-trips
    * instead of surfacing as a literal backslash-u sequence that
    * breaks `DataType.fromDDL`. */
  private def unjq(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case n => sb.append(n); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def field(json: String, key: String): String = {
    // minimal extraction for the manifest's own flat fields — the
    // values were written by jq() above, so unescaping mirrors it
    val m = ("\"" + key + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
    unjq(m.findFirstMatchIn(json)
      .getOrElse(throw new IllegalStateException(s"manifest missing '$key'"))
      .group(1))
  }

  /** Read a JSONL directory under its manifest's recorded schema,
    * failing loudly on any mismatch between manifest and directory. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = graft.util.FsIO.readString(spark, new Path(dir, ManifestName))
      .getOrElse(throw new IllegalStateException(
        s"$dir has no $ManifestName — not a JsonlDocs directory"))
    val ddl = field(manifest, "schema_ddl")
    val listed = """\{"name":"((?:[^"\\]|\\.)*)","bytes":(\d+)\}""".r
      .findAllMatchIn(manifest)
      .map(m => unjq(m.group(1)) -> m.group(2).toLong)
      .toMap
    val present = fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => s.getPath.getName -> s.getLen).toMap
    val missing = listed.keySet -- present.keySet
    val extra = present.keySet -- listed.keySet
    val resized = listed.keySet.intersect(present.keySet)
      .filter(k => listed(k) != present(k))
    require(missing.isEmpty && extra.isEmpty && resized.isEmpty,
      s"JSONL dir $dir does not match its manifest — " +
        s"missing=$missing extra=$extra resized=$resized")
    val schema = DataType.fromDDL(ddl).asInstanceOf[StructType]
    spark.read.schema(schema)
      .json(listed.keys.toSeq.sorted.map(n => new Path(dir, n).toString): _*)
  }
}
