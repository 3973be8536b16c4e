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

  /** Read features: returns `geom` (tagged EWKB binary) + `properties`
    * (raw JSON string) + `geojson` (the raw geometry JSON). Lines that
    * are not Feature objects (e.g. blank) are dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(get_json_object(col("value"), "$.geometry").as("gj"),
        get_json_object(col("value"), "$.properties").as("properties"))
      .where(col("gj").isNotNull)
      .select(expr("ST_GeomFromGeoJSON(gj)").as("geom"),
        col("properties"), col("gj").as("geojson"))

  /** Read features and project typed property columns via a DDL schema,
    * e.g. `"name STRING, pop BIGINT"`. */
  def readWithProps(spark: SparkSession, path: String,
      propsDdl: String): DataFrame = {
    val base = read(spark, path)
    base.select(col("geom") +:
      from_json(col("properties"), org.apache.spark.sql.types.StructType
        .fromDDL(propsDdl)).as("p") +: Nil: _*)
      .select(col("geom") +: org.apache.spark.sql.types.StructType
        .fromDDL(propsDdl).fieldNames.toSeq.map(f => col(s"p.$f").as(f)): _*)
  }

  /** Write `df` as one GeoJSON Feature per line. `geomCol` must hold
    * tagged geometry bytes; `propCols` become the properties object. */
  def write(df: DataFrame, geomCol: String, propCols: Seq[String],
      path: String): Unit = {
    val props =
      if (propCols.isEmpty) lit("{}")
      else to_json(struct(propCols.map(col): _*))
    df.select(concat(
        lit("""{"type": "Feature", "geometry": """),
        expr(s"ST_AsGeoJSON($geomCol)"),
        lit(""", "properties": """), props, lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
