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
    requireDistinctColumns(left, right)
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

  /** Tree item carrying the decoded geometry so nearest-neighbour search
    * can rank by TRUE geometry distance, not envelope distance. */
  private final class GeomItem(val geom: org.locationtech.jts.geom.Geometry,
      val idx: Int) extends Serializable

  /** True-geometry distance for STRtree branch-and-bound: JTS prunes with
    * envelope distance (a valid lower bound of this) internally, so the
    * k-nearest result is EXACT for arbitrary geometries — no over-fetch
    * cushion needed. */
  private object GeomItemDistance
      extends org.locationtech.jts.index.strtree.ItemDistance with Serializable {
    override def distance(a: org.locationtech.jts.index.strtree.ItemBoundable,
        b: org.locationtech.jts.index.strtree.ItemBoundable): Double =
      a.getItem.asInstanceOf[GeomItem].geom.distance(
        b.getItem.asInstanceOf[GeomItem].geom)
  }

  /** Exact k-nearest (distance, item-index) pairs of `g` from a built
    * GeomItem STRtree, ranked (distance, index) INCLUDING ties at the
    * k-th distance: JTS's branch-and-bound retains an ARBITRARY one of
    * several items tied at the boundary (tree-order dependent), so the
    * preliminary k-th distance seeds a range re-query over every
    * candidate within it and the documented tie-break is enforced over
    * the full tied set. The re-query envelope is sound because a
    * geometry within distance d of `g` has an envelope within d of
    * `g`'s envelope. */
  private def knnDeterministic(tree: STRtree, treeSize: Int,
      g: org.locationtech.jts.geom.Geometry, k: Int): Array[(Double, Int)] = {
    val env = g.getEnvelopeInternal
    val fetched = tree.nearestNeighbour(env, new GeomItem(g, -1),
      GeomItemDistance, math.min(k, treeSize))
    val prelim = fetched.iterator.collect {
      case it: GeomItem if it.idx >= 0 => g.distance(it.geom)
    }.toArray
    if (prelim.isEmpty) Array.empty
    else {
      val dk = prelim.max
      val env2 = new Envelope(env)
      env2.expandBy(dk)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Int)]
      val it = tree.query(env2).iterator()
      while (it.hasNext) it.next() match {
        case item: GeomItem if item.idx >= 0 =>
          val d = g.distance(item.geom)
          if (d <= dk) buf += ((d, item.idx))
        case _ => ()
      }
      buf.toArray.sortBy(identity).take(math.min(k, treeSize))
    }
  }

  /** The broadcast/knn joins emit left.fields ++ right.fields — a shared
    * name would produce a frame whose columns cannot be referenced. */
  private def requireDistinctColumns(left: DataFrame, right: DataFrame): Unit = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"column names must be distinct across sides: ${overlap.mkString(", ")}")
  }

  /** KNN join: for every left row, the k nearest right geometries
    * (cartesian distance). The right side is broadcast as an STRtree whose
    * items hold the decoded geometries; JTS's branch-and-bound
    * nearest-neighbour with a true-geometry ItemDistance is exact for any
    * geometry type (envelope distance is only the internal pruning bound).
    * Results get a deterministic (distance, build-index) tie-break. Ties
    * at the k-th distance keep the lowest build index. Map-only over the
    * left side, like [[broadcastJoin]]. Output: left columns ++
    * right columns ++ (knn_rank, knn_distance).
    *
    * The RIGHT side must fit in memory (it is collected and broadcast) —
    * for a small query set against a large corpus use
    * [[knnJoinBroadcastQueries]], which broadcasts the queries and keeps
    * the corpus distributed. */
  def knnJoin(left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String, k: Int): DataFrame = {
    requireDistinctColumns(left, right)
    val spark = left.sparkSession
    val rightRows = right.collect()
    val rightGeomIdx = right.schema.fieldIndex(rightGeom)
    val tree = new STRtree()
    rightRows.zipWithIndex.foreach { case (row, i) =>
      val bytes = row.getAs[Array[Byte]](rightGeomIdx)
      if (bytes != null) {
        val g = GeoKernels.geom(bytes)
        val env = g.getEnvelopeInternal
        if (!env.isNull) tree.insert(env, new GeomItem(g, i))
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

    left.mapPartitions { rows =>
      val t = bcTree.value
      val rrows = bcRows.value
      // JTS STRtree.size() is a full tree traversal — compute once per
      // partition, never per row
      val treeSize = t.size()
      rows.flatMap { lrow =>
        val bytes = lrow.getAs[Array[Byte]](leftGeomIdx)
        if (bytes == null || treeSize == 0) Iterator.empty
        else {
          val g = GeoKernels.geom(bytes)
          val env = g.getEnvelopeInternal
          if (env.isNull) Iterator.empty // empty geometry: no neighbors
          else {
            val ranked = knnDeterministic(t, treeSize, g, k)
            ranked.iterator.zipWithIndex.map { case ((d, i), rank) =>
              // Seq[Any]: a bare Seq(int, double) would widen the rank to Double
              Row.fromSeq(lrow.toSeq ++ rrows(i).toSeq ++ Seq[Any](rank + 1, d))
            }
          }
        }
      }
    }(outEncoder)
  }

  /** KNN join for a SMALL query side against a LARGE corpus — the shape
    * [[knnJoin]] must not be used for (it collects and broadcasts the
    * whole right side). Here the queries are broadcast instead; every
    * corpus partition builds a local STRtree over its own rows, answers
    * each query's exact k-nearest within the partition (true-geometry
    * branch-and-bound, like [[knnJoin]]), and a final per-query top-k
    * over the k·numPartitions partial candidates merges globally — only
    * k rows per (query, partition) cross the shuffle. Output matches
    * [[knnJoin]]: left columns ++ right columns ++ (knn_rank,
    * knn_distance); ties rank deterministically — (distance, row index)
    * within a partition, (distance, right-row content hash) across
    * partitions (exact duplicate rows are interchangeable). */
  def knnJoinBroadcastQueries(left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String, k: Int): DataFrame = {
    requireDistinctColumns(left, right)
    val spark = left.sparkSession
    val leftRows = left.collect()
    val leftGeomIdx = left.schema.fieldIndex(leftGeom)
    val queries = leftRows.zipWithIndex.flatMap { case (row, i) =>
      val bytes = row.getAs[Array[Byte]](leftGeomIdx)
      if (bytes == null) None
      else {
        val g = GeoKernels.geom(bytes)
        if (g.getEnvelopeInternal.isNull) None else Some((i, bytes))
      }
    }
    val bcQueries = spark.sparkContext.broadcast(queries)
    val bcLeftRows = spark.sparkContext.broadcast(leftRows)
    val rightGeomIdx = right.schema.fieldIndex(rightGeom)

    val partialSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField("__qidx", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("__dist", org.apache.spark.sql.types.DoubleType, false)) ++
      right.schema.fields)
    val partialEncoder = org.apache.spark.sql.Encoders.row(StructType(partialSchema))

    // per-partition exact top-k candidates
    val partials = right.mapPartitions { rows =>
      val qs = bcQueries.value
      if (qs.isEmpty) Iterator.empty
      else {
        val buf = rows.toArray
        val tree = new STRtree()
        buf.zipWithIndex.foreach { case (row, i) =>
          val bytes = row.getAs[Array[Byte]](rightGeomIdx)
          if (bytes != null) {
            val g = GeoKernels.geom(bytes)
            val env = g.getEnvelopeInternal
            if (!env.isNull) tree.insert(env, new GeomItem(g, i))
          }
        }
        if (tree.isEmpty) Iterator.empty
        else {
          tree.build()
          val treeSize = tree.size()
          qs.iterator.flatMap { case (qidx, qbytes) =>
            val qg = GeoKernels.geom(qbytes)
            // (distance, partition row index) rank with boundary ties
            // re-queried, like knnJoin
            knnDeterministic(tree, treeSize, qg, k).iterator.map { case (d, i) =>
              Row.fromSeq(Seq[Any](qidx, d) ++ buf(i).toSeq)
            }
          }
        }
      }
    }(partialEncoder)

    // global merge: per-query top-k over the tiny partial set. Cross-
    // partition ties order by a content hash of the right row — exact
    // duplicate rows are interchangeable, distinct tied rows rank
    // deterministically run-to-run.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col => fcol, xxhash64, row_number}
    val rightCols = right.schema.fieldNames.map(fcol)
    val w = Window.partitionBy("__qidx")
      .orderBy(fcol("__dist"), xxhash64(rightCols: _*))
    val merged = partials
      .withColumn("knn_rank", row_number().over(w))
      .where(fcol("knn_rank") <= k)

    val outSchema = StructType(left.schema.fields ++ right.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("knn_rank", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("knn_distance", org.apache.spark.sql.types.DoubleType, false)))
    val outEncoder = org.apache.spark.sql.Encoders.row(outSchema)
    val nRight = right.schema.fields.length
    merged.mapPartitions { rows =>
      val lrows = bcLeftRows.value
      rows.map { r =>
        val qidx = r.getInt(0)
        val dist = r.getDouble(1)
        val rightVals = (0 until nRight).map(i => r.get(2 + i))
        Row.fromSeq(lrows(qidx).toSeq ++ rightVals ++
          Seq[Any](r.getAs[Int]("knn_rank"), dist))
      }
    }(outEncoder)
  }

  /** Grid-partitioned spatial join for two large sides: equi-join on
    * covering cells (one shuffle keyed by cell), exact refine, and
    * anchor-cell dedup — each qualifying (left, right) pair survives only
    * in the canonical first shared cell, so multi-cell matches need no
    * `distinct()` and ALL columns of both sides flow through. The anchor
    * conjunct (a long comparison) runs before the exact JTS predicate, so
    * duplicate cell-pairs are discarded cheaply. Column names must be
    * distinct across the two inputs. Same technique as the Catalyst rule
    * in `SpatialJoinRewrite` — this is the explicit DataFrame-API twin. */
  def gridJoin(left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      cellSize: Double, predicate: String = "intersects"): DataFrame = {
    requireDistinctColumns(left, right)
    GeoFunctions.register(left.sparkSession)
    val l = left.withColumn("__cell_l",
      explode(GeoFunctions.grid_cells(col(leftGeom), cellSize, 0.0)))
    val r = right.withColumn("__cell_r",
      explode(GeoFunctions.grid_cells(col(rightGeom), cellSize, 0.0)))
    val predCol: Column = predicate match {
      case "intersects" => GeoFunctions.st_intersects(col(leftGeom), col(rightGeom))
      case "covers"     => GeoFunctions.st_covers(col(leftGeom), col(rightGeom))
      case "coveredby"  => GeoFunctions.st_coveredby(col(leftGeom), col(rightGeom))
      case other => throw new IllegalArgumentException(s"unsupported predicate: $other")
    }
    val anchor = col("__cell_l") ===
      GeoFunctions.grid_anchor_cell(col(leftGeom), col(rightGeom), cellSize, 0.0)
    l.join(r, col("__cell_l") === col("__cell_r"))
      .where(anchor && predCol)
      .drop("__cell_l", "__cell_r")
  }
}
