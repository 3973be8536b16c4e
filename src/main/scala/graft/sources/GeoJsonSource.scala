package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Newline-delimited GeoJSON (one Feature per line — the standard
  * "GeoJSONSeq"/ndjson interchange shape) as a Spark source/sink.
  *
  * Layered entirely on public pieces: `spark.read.text` for splittable
  * parallel line reading, `get_json_object`/`from_json` for property
  * access, and the engine's own `ST_GeomFromGeoJSON` / `ST_AsGeoJSON`
  * expressions for the geometry leg — so the source inherits their
  * RFC 7946 semantics and error behavior.
  *
  * Scale notes: text lines split by HDFS block, so a 100 TB feature
  * collection parallelizes like any text table; the write side emits one
  * self-contained line per row (no enclosing FeatureCollection), which
  * is what keeps the format streamable and concatenable. */
object GeoJsonSource {

  /** Read features: returns `geom` (tagged EWKB binary; null for RFC 7946
    * `"geometry": null` features) + `properties` (raw JSON string) +
    * `geojson` (the raw geometry JSON). Only objects whose `type` is
    * `Feature` are kept. By default non-Feature lines (blanks, stray
    * JSON, corrupt fragments) are silently dropped — the lenient
    * behavior bulk ingest wants; `strict = true` instead fails the read
    * on any non-blank line that is not a Feature, so corruption cannot
    * masquerade as a short file. */
  def read(spark: SparkSession, path: String,
      strict: Boolean = false): DataFrame = {
    val typed = spark.read.text(path)
      .select(col("value"),
        get_json_object(col("value"), "$.type").as("ftype"),
        get_json_object(col("value"), "$.geometry").as("gj"),
        get_json_object(col("value"), "$.properties").as("properties"))
    val features =
      if (!strict) typed.where(col("ftype") === "Feature")
      else typed
        .where(trim(col("value")) =!= "") // blanks are fine even in strict
        // the raise_error lives INSIDE the filter disjunction (an unused
        // projected column would be pruned away): Feature rows pass on
        // the left, anything else evaluates the right and throws
        .where(col("ftype") === "Feature" ||
          raise_error(concat(lit("not a GeoJSON Feature line: "),
            substring(col("value"), 1, 80))).cast("boolean"))
    // Column builders, not expr() strings: the source must work on a
    // session that never called GeoFunctions.register
    features.select(graft.functions.GeoFunctions.st_geomfromgeojson(col("gj")).as("geom"),
      col("properties"), col("gj").as("geojson"))
  }

  /** Read features and project typed property columns via a DDL schema,
    * e.g. `"name STRING, pop BIGINT"`. */
  def readWithProps(spark: SparkSession, path: String,
      propsDdl: String, strict: Boolean = false): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(propsDdl)
    read(spark, path, strict)
      .select(col("geom"), from_json(col("properties"), schema).as("p"))
      .select(col("geom") +: schema.fieldNames.toSeq.map(f => col(s"p.$f").as(f)): _*)
  }

  /** Write `df` as one GeoJSON Feature per line. `geomCol` must hold
    * tagged geometry bytes; null geometries become `"geometry": null`
    * (RFC 7946 §3.2) instead of a blank line that would silently vanish
    * on the next read. `propCols` become the properties object. */
  def write(df: DataFrame, geomCol: String, propCols: Seq[String],
      path: String): Unit = {
    val props =
      if (propCols.isEmpty) lit("{}")
      else to_json(struct(propCols.map(col): _*))
    df.select(concat(
        lit("""{"type": "Feature", "geometry": """),
        coalesce(graft.functions.GeoFunctions.st_asgeojson(col(geomCol)), lit("null")),
        lit(""", "properties": """), coalesce(props, lit("{}")),
        lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
