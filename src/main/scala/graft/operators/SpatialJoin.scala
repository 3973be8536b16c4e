package graft.operators

import graft.functions.{GeoFunctions, GeoKernels}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.locationtech.jts.geom.Envelope
import org.locationtech.jts.index.strtree.STRtree

/** Spatial join acceleration — the operator the reference's R-tree
  * building block (src/geo/index.rs:23-33) was meant to power but never
  * got wired to.
  *
  * Two strategies, chosen by the size of the right side:
  *
  *  - [[broadcastJoin]]: bulk-load the small side into a JTS STRtree,
  *    broadcast it, and stream the big side through `mapPartitions` —
  *    bbox candidates from the tree, exact JTS predicate refine. This is
  *    a map-only join: no shuffle of the big side at all, which is the
  *    winning plan at 100 TB whenever one side fits in executor memory
  *    (dimension tables, region polygons, tile grids).
  *
  *  - [[gridJoin]]: both sides large — cover each geometry's bbox with
  *    fixed-size grid cells, shuffle both sides by cell (an equi-join
  *    Catalyst can hash-partition), refine exactly, and de-dup multi-cell
  *    matches. Shuffle volume scales with Σ cells-per-geometry, and skew
  *    is bounded by choosing `cellSize` near the median bbox size (plus
  *    AQE skew splitting on the cell key).
  */
object SpatialJoin {

  /** Supported exact predicates for the refine phase. */
  private def refine(pred: String): (org.locationtech.jts.geom.Geometry,
      org.locationtech.jts.geom.Geometry) => Boolean = pred match {
    case "intersects" => (a, b) => a.intersects(b)
    case "covers"     => (a, b) => a.covers(b)
    case "coveredby"  => (a, b) => b.covers(a)
    case other => throw new IllegalArgumentException(s"unsupported predicate: $other")
  }

  /** Broadcast-STRtree join. `left` streams; `right` must fit in memory.
    * Output schema: left columns ++ right columns. The geometry columns
    * hold dialect-tagged WKB (the engine's standard cell layout). */
  def broadcastJoin(left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      predicate: String = "intersects"): DataFrame = {
    val spark = left.sparkSession
    val pred = refine(predicate)
    val rightRows = right.collect()
    val rightGeomIdx = right.schema.fieldIndex(rightGeom)
    val tree = new STRtree()
    rightRows.zipWithIndex.foreach { case (row, i) =>
      val bytes = row.getAs[Array[Byte]](rightGeomIdx)
      if (bytes != null) {
        val env = GeoKernels.geom(bytes).getEnvelopeInternal
        if (!env.isNull) tree.insert(env, Integer.valueOf(i))
      }
    }
    tree.build() // build once on the driver; workers only query
    val bcTree = spark.sparkContext.broadcast(tree)
    val bcRows = spark.sparkContext.broadcast(rightRows)

    val leftGeomIdx = left.schema.fieldIndex(leftGeom)
    val outSchema = StructType(left.schema.fields ++ right.schema.fields)
    val outEncoder = org.apache.spark.sql.Encoders.row(outSchema)
    left.mapPartitions { rows =>
      val t = bcTree.value
      val rrows = bcRows.value
      rows.flatMap { lrow =>
        val bytes = lrow.getAs[Array[Byte]](leftGeomIdx)
        if (bytes == null) Iterator.empty
        else {
          val g = GeoKernels.geom(bytes)
          val env = g.getEnvelopeInternal
          val cands = t.query(env).iterator()
          new Iterator[Row] {
            private var nextRow: Row = _
            private def advance(): Unit = {
              nextRow = null
              while (nextRow == null && cands.hasNext) {
                val i = cands.next().asInstanceOf[Integer].intValue()
                val rrow = rrows(i)
                val rg = GeoKernels.geom(rrow.getAs[Array[Byte]](rightGeomIdx))
                if (pred(g, rg))
                  nextRow = Row.fromSeq(lrow.toSeq ++ rrow.toSeq)
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): Row = { val r = nextRow; advance(); r }
          }
        }
      }
    }(outEncoder)
  }

  /** KNN join: for every left row, the k nearest right geometries
    * (cartesian distance). The right side is broadcast as an STRtree and
    * queried with JTS's branch-and-bound nearest-neighbour; results are
    * re-ranked with a deterministic (distance, index) tie-break. Map-only
    * over the left side, like [[broadcastJoin]]. Output: left columns ++
    * right columns ++ (knn_rank, knn_distance). */
  def knnJoin(left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String, k: Int): DataFrame = {
    val spark = left.sparkSession
    val rightRows = right.collect()
    val rightGeomIdx = right.schema.fieldIndex(rightGeom)
    val tree = new STRtree()
    rightRows.zipWithIndex.foreach { case (row, i) =>
      val bytes = row.getAs[Array[Byte]](rightGeomIdx)
      if (bytes != null) {
        val env = GeoKernels.geom(bytes).getEnvelopeInternal
        if (!env.isNull) tree.insert(env, Integer.valueOf(i))
      }
    }
    tree.build()
    val bcTree = spark.sparkContext.broadcast(tree)
    val bcRows = spark.sparkContext.broadcast(rightRows)
    val leftGeomIdx = left.schema.fieldIndex(leftGeom)
    val outSchema = StructType(left.schema.fields ++ right.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("knn_rank", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("knn_distance", org.apache.spark.sql.types.DoubleType, false)))
    val outEncoder = org.apache.spark.sql.Encoders.row(outSchema)

    val itemDist = new org.locationtech.jts.index.strtree.ItemDistance with Serializable {
      override def distance(a: org.locationtech.jts.index.strtree.ItemBoundable,
          b: org.locationtech.jts.index.strtree.ItemBoundable): Double = {
        val ga = a.getBounds.asInstanceOf[org.locationtech.jts.geom.Envelope]
        val gb = b.getBounds.asInstanceOf[org.locationtech.jts.geom.Envelope]
        ga.distance(gb)
      }
    }

    left.mapPartitions { rows =>
      val t = bcTree.value
      val rrows = bcRows.value
      rows.flatMap { lrow =>
        val bytes = lrow.getAs[Array[Byte]](leftGeomIdx)
        if (bytes == null || t.size() == 0) Iterator.empty
        else {
          val g = GeoKernels.geom(bytes)
          val env = g.getEnvelopeInternal
          if (env.isNull) Iterator.empty // empty geometry: no neighbors
          else {
            // over-fetch then exact re-rank: envelope distance is exact for
            // points and a lower bound otherwise; the 2k cushion plus exact
            // re-sort makes ranks correct whenever geometry extents are
            // small relative to neighbor spacing
            val fetched = t.nearestNeighbour(env, Integer.valueOf(-1), itemDist,
              math.min(2 * k, rrows.length))
            val ranked = fetched.iterator.collect {
              case i: Integer if i.intValue() >= 0 =>
                val rrow = rrows(i.intValue())
                val rg = GeoKernels.geom(rrow.getAs[Array[Byte]](rightGeomIdx))
                (g.distance(rg), i.intValue())
            }.toArray.sortBy(identity).take(k)
            ranked.iterator.zipWithIndex.map { case ((d, i), rank) =>
              // Seq[Any]: a bare Seq(int, double) would widen the rank to Double
              Row.fromSeq(lrow.toSeq ++ rrows(i).toSeq ++ Seq[Any](rank + 1, d))
            }
          }
        }
      }
    }(outEncoder)
  }

  /** Grid-partitioned spatial join for two large sides: equi-join on
    * covering cells, exact refine, distinct on the provided keys. Sides
    * are renamed internally, so identical column names on both inputs are
    * fine; output columns keep the caller's key names (which must differ). */
  def gridJoin(left: DataFrame, leftGeom: String, leftKey: String,
      right: DataFrame, rightGeom: String, rightKey: String,
      cellSize: Double, predicate: String = "intersects"): DataFrame = {
    require(leftKey != rightKey, "output key columns must have distinct names")
    GeoFunctions.register(left.sparkSession)
    def cells(df: DataFrame, key: String, geom: String, side: String): DataFrame =
      df.select(col(key).as(s"__${side}key"), col(geom).as(s"__${side}geom"))
        .withColumn("__bb", expr(s"box2d(__${side}geom)"))
        .withColumn("__cell", explode(expr(
          s"""flatten(transform(
                sequence(CAST(floor(__bb.xmin / $cellSize) AS INT),
                         CAST(floor(__bb.xmax / $cellSize) AS INT)),
                cx -> transform(
                  sequence(CAST(floor(__bb.ymin / $cellSize) AS INT),
                           CAST(floor(__bb.ymax / $cellSize) AS INT)),
                  cy -> struct(cx, cy))))""")))
        .drop("__bb")
    val l = cells(left, leftKey, leftGeom, "l")
    val r = cells(right, rightKey, rightGeom, "r")
    val predCol: Column = predicate match {
      case "intersects" => GeoFunctions.st_intersects(col("__lgeom"), col("__rgeom"))
      case "covers"     => GeoFunctions.st_covers(col("__lgeom"), col("__rgeom"))
      case "coveredby"  => GeoFunctions.st_coveredby(col("__lgeom"), col("__rgeom"))
      case other => throw new IllegalArgumentException(s"unsupported predicate: $other")
    }
    l.join(r, l("__cell") === r("__cell"))
      .where(predCol)
      .select(col("__lkey").as(leftKey), col("__rkey").as(rightKey))
      .distinct()
  }
}
