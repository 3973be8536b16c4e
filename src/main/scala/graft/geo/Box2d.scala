package graft.geo

import org.locationtech.jts.geom.{Envelope, Geometry}

/** 2-D bounding box, the reference's one composite type.
  *
  * Mirrors `Box2d` in the reference (src/geo/box.rs:10-37): an Arrow struct of
  * four non-nullable Float64 fields {xmin, ymin, xmax, ymax}. The
  * empty/initial sentinel is {MAX, MAX, MIN, MIN} (src/geo/box.rs:18-26) —
  * note Rust's `f64::MIN` is the most-negative finite double, i.e. Scala's
  * `Double.MinValue`, NOT the smallest positive value.
  */
case class Box2d(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {

  def isEmptySentinel: Boolean =
    xmin == Double.MaxValue && ymin == Double.MaxValue &&
      xmax == Double.MinValue && ymax == Double.MinValue

  /** Union of two boxes: component-wise min/max
    * (reference src/function/extent.rs:144-155). */
  def union(other: Box2d): Box2d =
    Box2d(
      math.min(xmin, other.xmin),
      math.min(ymin, other.ymin),
      math.max(xmax, other.xmax),
      math.max(ymax, other.ymax))

  def expandToGeometry(g: Geometry): Box2d = {
    val env = g.getEnvelopeInternal
    if (env.isNull) this
    else
      Box2d(
        math.min(xmin, env.getMinX),
        math.min(ymin, env.getMinY),
        math.max(xmax, env.getMaxX),
        math.max(ymax, env.getMaxY))
  }

  def width: Double = xmax - xmin
  def height: Double = ymax - ymin
}

object Box2d {
  /** Sentinel for "nothing folded in yet" (src/geo/box.rs:19-26). */
  val empty: Box2d =
    Box2d(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)

  /** Per-geometry bounding box; None for an empty geometry
    * (reference Box2D UDF src/function/box2d.rs:52-77 emits null). */
  def ofGeometry(g: Geometry): Option[Box2d] = {
    val env: Envelope = g.getEnvelopeInternal
    if (env.isNull) None
    else Some(Box2d(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
  }
}
