package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staged global dissolve — the PostGIS parallel-union recipe (union
  * per grid cell, then union the cells) as a composable operator.
  *
  * `st_union_agg` alone is already partial → shuffle → final (each map
  * task ships ONE dissolved geometry per group — see
  * [[org.apache.spark.sql.graft.StUnionAgg]]), which is the right plan
  * for grouped dissolves. Its worst case is the single-group global
  * dissolve `SELECT st_union_agg(g) FROM world`: every task's partial —
  * each potentially a continent-sized multipolygon — funnels into ONE
  * final task that unions all P of them back-to-back. The staged form
  * bounds that final fan-in: geometries group by the grid cell of their
  * envelope center (`cellSize` world units), each cell dissolves as its
  * own distributed aggregate, cells then merge `factor`× coarser per
  * level, and only the last few super-cells meet in the final task.
  * Union is associative, so the regrouping never changes the result
  * region — only the operation tree (vertex-level float coordinates can
  * differ in order-sensitive overlays, the same caveat st_union_agg
  * documents; measures, emptiness, and envelopes are stable, and on
  * integer-coordinate inputs the result is exact either way).
  *
  * Scale design (100 TB): every stage is a hash aggregate with map-side
  * partial dissolve — no stage ever holds more than
  * O(CompactAt · log n) geometries per task, the shuffle payload per
  * (task, cell) is one dissolved geometry, and fan-in per reduce task
  * is bounded by `factor²` cells (final task: the residual super-cell
  * count). Pick `cellSize` near the scale at which the data tiles —
  * cells that are mostly interior-disjoint dissolve cheap and shrink
  * the payload that climbs the pyramid. */
object Dissolve {

  /** One row, one `geom` column: the union of every non-null geometry
    * in `df(geomCol)` (null when the input is empty). */
  def gridDissolve(df: DataFrame, geomCol: String, cellSize: Double,
      levels: Int = 2, factor: Int = 8): DataFrame =
    gridDissolveByKey(df, Seq.empty, geomCol, cellSize, levels, factor)
      .select("geom")

  /** The staged dissolve PER GROUP: one row per distinct `keyCols`
    * value with `n_in` (count of non-null input geometries) and `geom`
    * (their union). The same pyramid as [[gridDissolve]] with the key
    * prepended to every stage's grouping, so a grouped
    * `st_union_agg(g) GROUP BY k` whose groups are LARGE (the q149
    * shape: few groups, each corpus-sized) stops funneling each
    * group's P task-partials — every one a potentially huge
    * multipolygon — into one final merge: unit geometries dissolve in
    * cell-local aggregates first and only `factor²`-bounded cell
    * unions climb to the per-group final. Empty `keyCols` degrades to
    * the global single-row dissolve.
    *
    * Same associativity caveat as [[gridDissolve]]: the result REGION
    * is exact, vertex order/float coordinates of overlay-sensitive
    * inputs can differ from the flat aggregation (never on
    * integer-coordinate inputs). */
  def gridDissolveByKey(df: DataFrame, keyCols: Seq[String], geomCol: String,
      cellSize: Double, levels: Int = 2, factor: Int = 8): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    require(levels >= 1, "levels must be >= 1")
    require(factor >= 2, "factor must be >= 2")
    GeoFunctions.register(df.sparkSession)
    val keys = keyCols.map(col)
    // BYTE-IDENTICAL geometries collapse BEFORE any union work: union is
    // idempotent, so dissolving each distinct (cell, geometry) once and
    // carrying its multiplicity in `__n` returns the identical region
    // and the identical `n_in` while the expensive st_union_agg kernel
    // sees only the distinct rows. The dedup itself is a plain codegen
    // hash aggregate (count over the serialized geometry bytes) with
    // map-side partial aggregation — on duplicate-free input it costs
    // one combined exchange of rows the pyramid's first level was going
    // to shuffle anyway (as partial-union buffers of the same payload),
    // and on duplicate-heavy input (dissolves of gridded/tiled layers)
    // it cuts the JTS union calls by the duplication factor (measured
    // q149: 600k input envelopes -> 35k distinct, r21).
    // NO eager `__g IS NOT NULL` filter: a predicate on a projected
    // geometry pushes below the projection by SUBSTITUTION, so the
    // upstream geometry expression (often a constructor like
    // ST_MakeEnvelope) evaluates TWICE per row — once in the pushed
    // filter, once in the projection (measured +0.35 s of the q149
    // fixture's 2.2 s, r21). Null geometries instead ride the pyramid
    // as their own (null cell, null geom) group: `count(__g)` keeps
    // them out of `n_in`, st_union_agg skips null inputs by contract
    // (UnionAggSpec), and the keyed path drops all-null keys at the
    // end where the frame is rows-per-key sized.
    var cur = df.select(keys :+ col(geomCol).as("__g"): _*)
      .withColumn("__b", GeoFunctions.box2d(col("__g")))
      .withColumn("__cx",
        floor((col("__b.xmin") + col("__b.xmax")) / 2 / cellSize).cast("long"))
      .withColumn("__cy",
        floor((col("__b.ymin") + col("__b.ymax")) / 2 / cellSize).cast("long"))
      .groupBy(keys ++ Seq(col("__cx"), col("__cy"), col("__g")): _*)
      .agg(count(col("__g")).as("__n"))
      .select(keys ++ Seq(col("__cx"), col("__cy"), col("__n"), col("__g")): _*)
    for (_ <- 1 to levels) {
      cur = cur.groupBy(keys ++ Seq(col("__cx"), col("__cy")): _*)
        .agg(GeoFunctions.st_union_agg(col("__g")).as("__g"),
          sum("__n").as("__n"))
        .select(keys ++ Seq(
          floor(col("__cx") / factor).cast("long").as("__cx"),
          floor(col("__cy") / factor).cast("long").as("__cy"),
          col("__n"), col("__g")): _*)
    }
    val out = cur.groupBy(keys: _*)
      .agg(sum("__n").as("n_in"),
        GeoFunctions.st_union_agg(col("__g")).as("geom"))
    // keyed path: a key whose geometries were ALL null emitted no row
    // before (the old eager filter removed its rows entirely) — keep
    // that contract with a rows-per-key-sized filter. Global path: the
    // single aggregate row always emits (n_in null, geom null on empty
    // input — the pinned gridDissolve empty-input shape).
    if (keyCols.isEmpty) out else out.where(col("n_in") > 0)
  }
}
