package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector-tile pyramid materialization — the batch job behind every
  * slippy-map serving stack: for each zoom level, assign every
  * geometry to the web-mercator tiles its envelope covers and emit
  * the geometry transformed into each tile's 4096-grid MVT space.
  *
  * Scale design: tile assignment is pure envelope arithmetic on the
  * codegen'd `Box2D` struct — two chained `explode(sequence(...))`
  * generators fan a geometry out to exactly its covering (x, y)
  * ranges, so output size is the true tile-coverage count, never a
  * zoom-sized cross join; the per-row transform is the codegen'd
  * `ST_AsMVTGeom` affine. Everything is map-side (no shuffle at all —
  * writers typically `repartition($"z", $"x", $"y")` afterwards to
  * cluster tiles into files, which is the ONLY exchange the job
  * needs).
  *
  * Tile ownership law (deterministic, oracle-replayed): with
  * `ts = 2·E/2^z`, a geometry covers `x ∈ [⌊(xmin+E)/ts⌋, ⌊(xmax+E)/ts⌋]`
  * and `y ∈ [⌊(E−ymax)/ts⌋, ⌊(E−ymin)/ts⌋]` clamped to `[0, 2^z−1]`
  * (y counts from the top, the XYZ convention) — a coordinate exactly
  * on a tile edge belongs to the tile on its right/below AND still
  * emits the touching tile via its envelope span. Input geometries
  * must be in EPSG:3857 meters. */
object Tiles {

  private val E = 20037508.342789244

  def tilePyramid(df: DataFrame, idCol: String, geomCol: String,
      minZoom: Int, maxZoom: Int): DataFrame = {
    require(minZoom >= 0 && maxZoom >= minZoom && maxZoom <= 30,
      s"need 0 <= minZoom <= maxZoom <= 30 (got $minZoom..$maxZoom)")
    df.select(col(idCol), col(geomCol).as("__g"),
        expr(s"Box2D($geomCol)").as("__b"))
      .where(col("__b").isNotNull)
      .withColumn("z", explode(sequence(lit(minZoom), lit(maxZoom))))
      .withColumn("__ts", lit(2 * E) / pow(lit(2.0), col("z")))
      .withColumn("__n", pow(lit(2.0), col("z")).cast("long"))
      .withColumn("x", explode(sequence(
        greatest(lit(0L),
          floor((col("__b.xmin") + lit(E)) / col("__ts")).cast("long")),
        least(col("__n") - 1,
          floor((col("__b.xmax") + lit(E)) / col("__ts")).cast("long")))))
      .withColumn("y", explode(sequence(
        greatest(lit(0L),
          floor((lit(E) - col("__b.ymax")) / col("__ts")).cast("long")),
        least(col("__n") - 1,
          floor((lit(E) - col("__b.ymin")) / col("__ts")).cast("long")))))
      .withColumn("mvt_geom", expr(
        "ST_AsMVTGeom(__g, Box2D(ST_TileEnvelope(z, CAST(x AS INT), CAST(y AS INT))))"))
      .select(col(idCol), col("z"), col("x"), col("y"), col("mvt_geom"))
  }
}
