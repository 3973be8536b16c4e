package graft.functions

import graft.geo.GeomCodec
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.locationtech.jts.geom.Geometry

/** st_collect UDAF — gathers a group's geometries into one
  * GeometryCollection (PostGIS ST_Collect; collection semantics, no
  * dissolve — ST_Union's aggregate form would dissolve).
  *
  * The buffer is the list of tagged-WKB members, so partial aggregation
  * concatenates byte arrays and only `finish` decodes. Unlike st_extent
  * the shuffled state grows with the group — callers should bound group
  * sizes (or pre-aggregate) when groups can reach millions of members;
  * that is inherent to the operation, not the implementation.
  */
object CollectAggregator extends Aggregator[Array[Byte], Seq[Array[Byte]], Array[Byte]] {

  override def zero: Seq[Array[Byte]] = Vector.empty

  override def reduce(buf: Seq[Array[Byte]], tagged: Array[Byte]): Seq[Array[Byte]] =
    if (tagged == null) buf else buf :+ tagged

  override def merge(a: Seq[Array[Byte]], b: Seq[Array[Byte]]): Seq[Array[Byte]] = a ++ b

  override def finish(members: Seq[Array[Byte]]): Array[Byte] = {
    val geoms = new Array[Geometry](members.length)
    var i = 0
    while (i < members.length) { geoms(i) = GeomCodec.decode(members(i)); i += 1 }
    GeomCodec.encodeEwkb(
      GeomCodec.geometryFactory.createGeometryCollection(geoms))
  }

  override def bufferEncoder: Encoder[Seq[Array[Byte]]] =
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
      scala.reflect.classTag[Seq[Array[Byte]]],
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.BinaryEncoder,
      containsNull = false, lenientSerialization = false
    ).asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Seq[Array[Byte]]]]

  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
