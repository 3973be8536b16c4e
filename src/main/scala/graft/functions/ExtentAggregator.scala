package graft.functions

import graft.geo.{Box2d, GeomCodec}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** st_extent UDAF — union of bounding boxes of all geometries in a group.
  *
  * Mirrors the reference's ExtentAccumulator two-phase contract
  * (src/function/extent.rs:29-155): `reduce` ≙ update_batch, `merge` ≙
  * merge_batch (the buffer Box2d is the `state()` struct), `finish` ≙
  * evaluate. An empty/all-null group yields the sentinel
  * {MAX, MAX, MIN, MIN} exactly as the reference does
  * (src/geo/box.rs:19-26). Spark runs this partial+final with a map-side
  * combine, so at 100 TB only one 4-double struct per group crosses the
  * shuffle.
  */
object ExtentAggregator extends Aggregator[Array[Byte], Box2d, Box2d] {

  override def zero: Box2d = Box2d.empty

  override def reduce(buf: Box2d, tagged: Array[Byte]): Box2d =
    if (tagged == null) buf
    else buf.expandToGeometry(GeoKernels.geom(tagged))

  override def merge(a: Box2d, b: Box2d): Box2d = a.union(b)

  override def finish(reduction: Box2d): Box2d = reduction

  override def bufferEncoder: Encoder[Box2d] = Encoders.product[Box2d]

  override def outputEncoder: Encoder[Box2d] = Encoders.product[Box2d]
}
