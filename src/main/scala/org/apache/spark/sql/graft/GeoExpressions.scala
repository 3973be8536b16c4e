package org.apache.spark.sql.graft

import graft.functions.GeoKernels

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the reference's ST_* surface.
  *
  * Each is a thin, codegen-friendly wrapper over a static [[GeoKernels]]
  * method, mirroring one reference UDF (citations in each class). Compared
  * to Scala UDFs this keeps the call inside WholeStageCodegen (no encoder
  * round-trip), and `foldable` lets Catalyst constant-fold
  * `ST_GeomFromText('...')` literals at plan time so constant geometries
  * are parsed exactly once per query, not once per row.
  */
trait GeoExpression extends Expression {
  // constant arguments fold to a binary Literal at optimization time
  override def foldable: Boolean = children.forall(_.foldable)
  override def nullIntolerant: Boolean = true
}

object GeoExpr {
  val K = "graft.functions.GeoKernels"

  val box2dType: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))
}

// ---------------------------------------------------------------------------
// constructors
// ---------------------------------------------------------------------------

/** ST_GeomFromText(wkt [, srid]) → tagged EWKB
  * (reference src/function/geom_from_text.rs:33-81). */
case class StGeomFromText(wkt: Expression, srid: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def left: Expression = wkt
  override def right: Expression = srid
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromtext"
  override protected def nullSafeEval(w: Any, s: Any): Any =
    GeoKernels.geomFromText(w.asInstanceOf[UTF8String].toString, s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) => s"${GeoExpr.K}.geomFromText($w.toString(), $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(wkt = l, srid = r)
}

/** ST_GeomFromWKB(wkb [, srid]) → tagged EWKB
  * (reference src/function/geom_from_wkb.rs:33-81). */
case class StGeomFromWkb(wkb: Expression, srid: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def left: Expression = wkb
  override def right: Expression = srid
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromwkb"
  override protected def nullSafeEval(w: Any, s: Any): Any =
    GeoKernels.geomFromWkb(w.asInstanceOf[Array[Byte]], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, s) => s"${GeoExpr.K}.geomFromWkb($w, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(wkb = l, srid = r)
}

/** ST_GeomFromGeoJSON(json [, srid]) → tagged EWKB (PostGIS-standard
  * extra; the read twin of ST_AsGeoJSON). */
case class StGeomFromGeoJson(json: Expression, srid: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def left: Expression = json
  override def right: Expression = srid
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromgeojson"
  override protected def nullSafeEval(j: Any, s: Any): Any =
    GeoKernels.geomFromGeoJson(j.asInstanceOf[UTF8String].toString, s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (j, s) => s"${GeoExpr.K}.geomFromGeoJson($j.toString(), $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(json = l, srid = r)
}

/** ST_MakeEnvelope(xmin, ymin, xmax, ymax [, srid]) → rectangle polygon;
  * tagged EWKB when SRID given, plain WKB otherwise
  * (reference src/function/make_envelope.rs:59-105). */
case class StMakeEnvelope(children: Seq[Expression], hasSrid: Boolean)
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType) ++
      (if (hasSrid) Seq(IntegerType) else Nil)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_makeenvelope"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoKernels.makeEnvelope(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      if (hasSrid) vs(4).asInstanceOf[Int] else 0, hasSrid)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val srid = if (hasSrid) evs(4).value.toString else "0"
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = ${GeoExpr.K}.makeEnvelope(${evs(0).value}, ${evs(1).value},
            ${evs(2).value}, ${evs(3).value}, $srid, $hasSrid);
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

// ---------------------------------------------------------------------------
// serializers / accessors (unary geometry → scalar)
// ---------------------------------------------------------------------------

abstract class GeoUnaryString extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  def kernel: String
  def apply(tagged: Array[Byte]): String
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(apply(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      g => s"UTF8String.fromString(${GeoExpr.K}.$kernel($g))")
}

/** ST_AsText (reference src/function/as_text.rs). */
case class StAsText(child: Expression) extends GeoUnaryString {
  override def kernel: String = "asText"
  override def apply(g: Array[Byte]): String = GeoKernels.asText(g)
  override def prettyName: String = "st_astext"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsEWKT (reference src/function/as_ewkt.rs). */
case class StAsEwkt(child: Expression) extends GeoUnaryString {
  override def kernel: String = "asEwkt"
  override def apply(g: Array[Byte]): String = GeoKernels.asEwkt(g)
  override def prettyName: String = "st_asewkt"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsGeoJSON (reference src/function/as_geojson.rs). */
case class StAsGeoJson(child: Expression) extends GeoUnaryString {
  override def kernel: String = "asGeoJson"
  override def apply(g: Array[Byte]): String = GeoKernels.asGeoJson(g)
  override def prettyName: String = "st_asgeojson"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_GeometryType (reference src/function/geometry_type.rs:79-92). */
case class StGeometryType(child: Expression) extends GeoUnaryString {
  override def kernel: String = "geometryType"
  override def apply(g: Array[Byte]): String = GeoKernels.geometryType(g)
  override def prettyName: String = "st_geometrytype"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_SRID — null when the geometry carries no SRID
  * (reference src/function/srid.rs:46-67). */
case class StSrid(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "st_srid"
  override protected def nullSafeEval(g: Any): Any = {
    val s = GeoKernels.srid(g.asInstanceOf[Array[Byte]])
    if (s == null) null else s.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      java.lang.Integer ${ev.value}Boxed = ${GeoExpr.K}.srid($g);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.intValue(); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Box2D — struct{xmin,ymin,xmax,ymax}, null for empty geometry
  * (reference src/function/box2d.rs:46-77). */
case class StBox2d(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = GeoExpr.box2dType
  override def nullable: Boolean = true
  override def prettyName: String = "box2d"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.box2dRow(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      InternalRow ${ev.value}Row = ${GeoExpr.K}.box2dRow($g);
      if (${ev.value}Row == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Row; }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// extra PostGIS-standard accessors (not in the reference; used by
// oracle-able verification queries and generally expected by users)

abstract class GeoUnaryDouble extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  def kernel: String
  def apply(g: Array[Byte]): Double
  override protected def nullSafeEval(g: Any): Any = apply(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.$kernel($g)")
}

case class StArea(child: Expression) extends GeoUnaryDouble {
  override def kernel: String = "area"
  override def apply(g: Array[Byte]): Double = GeoKernels.area(g)
  override def prettyName: String = "st_area"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** NULL for empty geometries (PostGIS ST_X of POINT EMPTY is NULL). */
abstract class GeoUnaryCoord extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  def kernel: String
  def apply(g: Array[Byte]): java.lang.Double
  override protected def nullSafeEval(g: Any): Any = {
    val v = apply(g.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  // allocation-free: the missing-coordinate check hits the decode cache and
  // mirrors the interpreted kernel's null contract exactly (a non-empty
  // GEOMETRYCOLLECTION whose first component is empty has isEmpty=false but
  // a null first coordinate — checking isEmpty alone would NPE here)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      if (${GeoExpr.K}.coordMissing($g)) { ${ev.isNull} = true; }
      else { ${ev.value} = ${GeoExpr.K}.${kernel}Prim($g); }""")
}

case class StX(child: Expression) extends GeoUnaryCoord {
  override def kernel: String = "x"
  override def apply(g: Array[Byte]): java.lang.Double = GeoKernels.x(g)
  override def prettyName: String = "st_x"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StY(child: Expression) extends GeoUnaryCoord {
  override def kernel: String = "y"
  override def apply(g: Array[Byte]): java.lang.Double = GeoKernels.y(g)
  override def prettyName: String = "st_y"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Distance — minimum cartesian distance (PostGIS-standard extra). */
case class StDistance(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.distance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.distance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StNumGeometries(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "st_numgeometries"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.numGeometries(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.numGeometries($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StNumPoints(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "st_npoints"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.numPoints(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.numPoints($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Unary geometry→geometry accessor that returns NULL for inapplicable
  * input types (PostGIS convention: ST_StartPoint of a polygon is NULL,
  * not an error). */
abstract class GeoUnaryGeomNullable extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  def kernel: String
  def apply(g: Array[Byte]): Array[Byte]
  override protected def nullSafeEval(g: Any): Any = apply(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      ${ev.value} = ${GeoExpr.K}.$kernel($g);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
}

/** ST_StartPoint — first point of a LineString, null otherwise. */
case class StStartPoint(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "startPoint"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.startPoint(g)
  override def prettyName: String = "st_startpoint"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_EndPoint — last point of a LineString, null otherwise. */
case class StEndPoint(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "endPoint"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.endPoint(g)
  override def prettyName: String = "st_endpoint"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_ExteriorRing — outer ring of a Polygon as a LineString, null
  * otherwise. */
case class StExteriorRing(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "exteriorRing"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.exteriorRing(g)
  override def prettyName: String = "st_exteriorring"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Reverse — vertex order reversed in every component. */
case class StReverse(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_reverse"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.reverse(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.reverse($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_PointN — 1-based nth point of a LineString (negative n from the
  * end), null for other types or out-of-range. */
case class StPointN(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_pointn"
  override protected def nullSafeEval(g: Any, n: Any): Any =
    GeoKernels.pointN(g.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, n) => s"""
      ${ev.value} = ${GeoExpr.K}.pointN($g, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_NumInteriorRings — interior-ring count of a Polygon, null
  * otherwise. */
case class StNumInteriorRings(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "st_numinteriorrings"
  override protected def nullSafeEval(g: Any): Any = {
    val n = GeoKernels.numInteriorRings(g.asInstanceOf[Array[Byte]])
    if (n == null) null else n.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      java.lang.Integer ${ev.value}Boxed = ${GeoExpr.K}.numInteriorRings($g);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.intValue(); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_GeometryN — 1-based nth component of a collection; a
  * non-collection input is its own first component. Null out-of-range. */
case class StGeometryN(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geometryn"
  override protected def nullSafeEval(g: Any, n: Any): Any =
    GeoKernels.geometryN(g.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, n) => s"""
      ${ev.value} = ${GeoExpr.K}.geometryN($g, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_InteriorRingN — 1-based nth interior ring of a Polygon as a
  * LineString; null for other types or out-of-range n. */
case class StInteriorRingN(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_interiorringn"
  override protected def nullSafeEval(g: Any, n: Any): Any =
    GeoKernels.interiorRingN(g.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, n) => s"""
      ${ev.value} = ${GeoExpr.K}.interiorRingN($g, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_NRings — ring count including exterior rings, all polygonal
  * components; 0 for non-areal input. */
case class StNRings(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "st_nrings"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.nRings(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.nRings($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** OGC ST_NumPoints — vertex count of a LineString ONLY (null
  * otherwise); the permissive any-geometry count is ST_NPoints. */
case class StNumPointsStrict(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "st_numpoints"
  override protected def nullSafeEval(g: Any): Any = {
    val n = GeoKernels.numPointsStrict(g.asInstanceOf[Array[Byte]])
    if (n == null) null else n.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      java.lang.Integer ${ev.value}Boxed = ${GeoExpr.K}.numPointsStrict($g);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.intValue(); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Dimension — topological dimension (0/1/2), max over components. */
case class StDimension(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "st_dimension"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.dimension(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.dimension($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_CoordDim — coordinate dimension; always 2 in the 2-D codec. */
case class StCoordDim(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "st_coorddim"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.coordDim(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.coordDim($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_BoundingDiagonal — bbox diagonal as a 2-point LineString. */
case class StBoundingDiagonal(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_boundingdiagonal"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.boundingDiagonal(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.boundingDiagonal($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_MakePoint(x, y) / ST_Point(x, y[, srid]) — point from raw
  * coordinates; EWKB when the SRID argument is present. */
case class StMakePoint(children: Seq[Expression], hasSrid: Boolean)
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType) ++ (if (hasSrid) Seq(IntegerType) else Nil)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_makepoint"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoKernels.makePoint(vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      if (hasSrid) vs(2).asInstanceOf[Int] else 0, hasSrid)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val srid = if (hasSrid) evs(2).value.toString else "0"
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = ${GeoExpr.K}.makePoint(${evs(0).value}, ${evs(1).value},
            $srid, $hasSrid);
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** ST_MakePolygon(shell) — polygon from a closed shell LineString. */
case class StMakePolygon(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "makePolygonShell"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.makePolygonShell(g)
  override def prettyName: String = "st_makepolygon"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_MakePolygon(shell, array<hole>) — with interior rings. */
case class StMakePolygonHoles(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_makepolygon"
  override protected def nullSafeEval(g: Any, hs: Any): Any =
    GeoKernels.makePolygonHoles(g.asInstanceOf[Array[Byte]],
      hs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, hs) => s"""
      ${ev.value} = ${GeoExpr.K}.makePolygonHoles($g, $hs);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_LineFromMultiPoint — LineString through the points of a
  * MultiPoint in order; null for other types. */
case class StLineFromMultiPoint(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "lineFromMultiPoint"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.lineFromMultiPoint(g)
  override def prettyName: String = "st_linefrommultipoint"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Square(size, i, j) — one square-grid cell as a polygon. */
case class StSquare(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_square"
  override protected def nullSafeEval(s: Any, i: Any, j: Any): Any =
    GeoKernels.squareCell(s.asInstanceOf[Double], i.asInstanceOf[Int], j.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i, j) => s"${GeoExpr.K}.squareCell($s, $i, $j)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Hexagon(size, i, j) — one flat-top hex-grid cell as a polygon. */
case class StHexagon(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_hexagon"
  override protected def nullSafeEval(s: Any, i: Any, j: Any): Any =
    GeoKernels.hexagonCell(s.asInstanceOf[Double], i.asInstanceOf[Int], j.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i, j) => s"${GeoExpr.K}.hexagonCell($s, $i, $j)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

object GridExpr {
  /** (i, j, geom) struct array — the PostGIS setof-record shape, made
    * explodable: `explode(ST_SquareGrid(...))` then `col.i/col.j/col.geom`. */
  val elementType: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("geom", BinaryType, nullable = false)))
}

/** ST_SquareGrid(size, bounds) — all cells covering the bounds' bbox. */
case class StSquareGrid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, BinaryType)
  override def dataType: DataType = ArrayType(GridExpr.elementType, containsNull = false)
  override def prettyName: String = "st_squaregrid"
  override protected def nullSafeEval(s: Any, b: Any): Any =
    GeoKernels.squareGrid(s.asInstanceOf[Double], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, b) => s"${GeoExpr.K}.squareGrid($s, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_HexagonGrid(size, bounds) — hexagons overlapping the bounds' bbox. */
case class StHexagonGrid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, BinaryType)
  override def dataType: DataType = ArrayType(GridExpr.elementType, containsNull = false)
  override def prettyName: String = "st_hexagongrid"
  override protected def nullSafeEval(s: Any, b: Any): Any =
    GeoKernels.hexagonGrid(s.asInstanceOf[Double], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, b) => s"${GeoExpr.K}.hexagonGrid($s, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_GeneratePoints(geom, n, seed) — n seeded-deterministic uniform
  * points inside a polygonal geometry, as a MULTIPOINT. */
case class StGeneratePoints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_generatepoints"
  override protected def nullSafeEval(g: Any, n: Any, s: Any): Any =
    GeoKernels.generatePoints(g.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
      s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, n, s) => s"${GeoExpr.K}.generatePoints($g, $n, $s)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Affine — 2-D 6-parameter affine transform. */
case class StAffine(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_affine"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoKernels.affine(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Double],
      vs(5).asInstanceOf[Double], vs(6).asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = ${GeoExpr.K}.affine(${evs.map(_.value).mkString(", ")});
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** ST_TransScale — translate then scale. */
case class StTransScale(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_transscale"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else GeoKernels.transScale(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Double], vs(4).asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = ${GeoExpr.K}.transScale(${evs.map(_.value).mkString(", ")});
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** ST_ShiftLongitude — swap longitudes between -180..180 and 0..360. */
case class StShiftLongitude(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_shiftlongitude"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.shiftLongitude(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.shiftLongitude($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_WrapX(geom, wrap, move) — shift components across a vertical line. */
case class StWrapX(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_wrapx"
  override protected def nullSafeEval(g: Any, w: Any, m: Any): Any =
    GeoKernels.wrapX(g.asInstanceOf[Array[Byte]], w.asInstanceOf[Double],
      m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, m) => s"${GeoExpr.K}.wrapX($g, $w, $m)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Scroll(line, point) — closed line re-started at the given vertex. */
case class StScroll(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_scroll"
  override protected def nullSafeEval(l: Any, p: Any): Any =
    GeoKernels.scroll(l.asInstanceOf[Array[Byte]], p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p) => s"""
      ${ev.value} = ${GeoExpr.K}.scroll($l, $p);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_ChaikinSmoothing(geom, iters, preserveEnds). */
case class StChaikinSmoothing(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType, BooleanType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_chaikinsmoothing"
  override protected def nullSafeEval(g: Any, n: Any, p: Any): Any =
    GeoKernels.chaikinSmoothing(g.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
      p.asInstanceOf[Boolean])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, n, p) => s"${GeoExpr.K}.chaikinSmoothing($g, $n, $p)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_SimplifyVW(geom, areaTolerance) — Visvalingam-Whyatt. */
case class StSimplifyVW(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_simplifyvw"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.simplifyVW(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.simplifyVW($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_SimplifyPolygonHull(geom, vertexFraction[, isOuter]). */
case class StSimplifyPolygonHull(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, BooleanType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_simplifypolygonhull"
  override protected def nullSafeEval(g: Any, f: Any, o: Any): Any =
    GeoKernels.simplifyPolygonHull(g.asInstanceOf[Array[Byte]],
      f.asInstanceOf[Double], o.asInstanceOf[Boolean])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, f, o) => s"""
      ${ev.value} = ${GeoExpr.K}.simplifyPolygonHull($g, $f, $o);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_QuantizeCoordinates(geom, prec) — zero insignificant mantissa bits. */
case class StQuantizeCoordinates(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_quantizecoordinates"
  override protected def nullSafeEval(g: Any, p: Any): Any =
    GeoKernels.quantizeCoordinates(g.asInstanceOf[Array[Byte]], p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, p) => s"${GeoExpr.K}.quantizeCoordinates($g, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_GeometricMedian(points, tol, maxIter) — Weiszfeld iteration. */
case class StGeometricMedian(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geometricmedian"
  override protected def nullSafeEval(g: Any, t: Any, n: Any): Any =
    GeoKernels.geometricMedian(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, t, n) => s"""
      ${ev.value} = ${GeoExpr.K}.geometricMedian($g, $t, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_IsValidReason — "Valid Geometry" or the defect with coordinates. */
case class StIsValidReason(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_isvalidreason"
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(GeoKernels.isValidReason(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.isValidReason($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_IsValidDetail — (valid, reason, location) struct. */
case class StIsValidDetail(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("valid", BooleanType, nullable = false),
    StructField("reason", StringType, nullable = true),
    StructField("location", BinaryType, nullable = true)))
  override def prettyName: String = "st_isvaliddetail"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.isValidDetail(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.isValidDetail($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Summary — one-line-per-component textual description. */
case class StSummary(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_summary"
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(GeoKernels.summary(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.summary($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsKML — KML fragment (2-D). */
case class StAsKml(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_askml"
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(GeoKernels.asKml(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.asKml($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsSVG — SVG path/attribute text, y negated. */
case class StAsSvg(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_assvg"
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(GeoKernels.asSvg(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.asSvg($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsHEXEWKB — uppercase hex EWKB text. */
case class StAsHexEwkb(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_ashexewkb"
  override protected def nullSafeEval(g: Any): Any =
    UTF8String.fromString(GeoKernels.asHexEwkb(g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.asHexEwkb($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_GeomFromHEXEWKB — parse the hex EWKB text form. */
case class StGeomFromHexEwkb(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_geomfromhexewkb"
  override protected def nullSafeEval(h: Any): Any =
    GeoKernels.geomFromHexEwkb(h.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"${GeoExpr.K}.geomFromHexEwkb($h.toString())")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_SharedPaths — shared linework split by direction agreement. */
case class StSharedPaths(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_sharedpaths"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.sharedPaths(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = ${GeoExpr.K}.sharedPaths($a, $b);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_DistanceSphere — haversine meters on the mean-radius sphere. */
case class StDistanceSphere(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_distancesphere"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = GeoKernels.distanceSphere(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Boxed = ${GeoExpr.K}.distanceSphere($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_DistanceSpheroid — Vincenty meters on WGS84. */
case class StDistanceSpheroid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_distancespheroid"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = GeoKernels.distanceSpheroid(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Boxed = ${GeoExpr.K}.distanceSpheroid($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_AsLatLonText — D°M'S.SSS"C formatting of a point. */
case class StAsLatLonText(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "st_aslatlontext"
  override protected def nullSafeEval(g: Any): Any = {
    val s = GeoKernels.asLatLonText(g.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      String ${ev.value}Str = ${GeoExpr.K}.asLatLonText($g);
      if (${ev.value}Str == null) { ${ev.isNull} = true; }
      else { ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(${ev.value}Str); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_OrderingEquals — exact type + coordinate-order equality. */
case class StOrderingEquals(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_orderingequals"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.orderingEquals(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.orderingEquals($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_PointInsideCircle(point, cx, cy, r). */
case class StPointInsideCircle(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_pointinsidecircle"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) null
    else {
      val v = GeoKernels.pointInsideCircle(vs(0).asInstanceOf[Array[Byte]],
        vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double])
      if (v == null) null else v.booleanValue()
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(e => e.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          java.lang.Boolean ${ev.value}Boxed = ${GeoExpr.K}.pointInsideCircle(
            ${evs(0).value}, ${evs(1).value}, ${evs(2).value}, ${evs(3).value});
          if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
          else { ${ev.value} = ${ev.value}Boxed.booleanValue(); }
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** ST_LineCrossingDirection — crossing-behavior code of line2 vs line1. */
case class StLineCrossingDirection(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "st_linecrossingdirection"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = GeoKernels.lineCrossingDirection(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.intValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Integer ${ev.value}Boxed = ${GeoExpr.K}.lineCrossingDirection($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.intValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Unary geometry→boolean metadata accessor. */
abstract class GeoUnaryBool extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  def kernel: String
  def apply(g: Array[Byte]): Boolean
  override protected def nullSafeEval(g: Any): Any = apply(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.$kernel($g)")
}

/** Unary geometry→int metadata accessor. */
abstract class GeoUnaryInt extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  def kernel: String
  def apply(g: Array[Byte]): Int
  override protected def nullSafeEval(g: Any): Any = apply(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.$kernel($g)")
}

case class StIsEmpty(child: Expression) extends GeoUnaryBool {
  override def kernel: String = "isEmpty"
  override def apply(g: Array[Byte]): Boolean = GeoKernels.isEmpty(g)
  override def prettyName: String = "st_isempty"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StIsCollection(child: Expression) extends GeoUnaryBool {
  override def kernel: String = "isCollection"
  override def apply(g: Array[Byte]): Boolean = GeoKernels.isCollection(g)
  override def prettyName: String = "st_iscollection"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StNDims(child: Expression) extends GeoUnaryInt {
  override def kernel: String = "nDims"
  override def apply(g: Array[Byte]): Int = GeoKernels.nDims(g)
  override def prettyName: String = "st_ndims"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StZmFlag(child: Expression) extends GeoUnaryInt {
  override def kernel: String = "zmFlag"
  override def apply(g: Array[Byte]): Int = GeoKernels.zmFlag(g)
  override def prettyName: String = "st_zmflag"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StHasArc(child: Expression) extends GeoUnaryBool {
  override def kernel: String = "hasArc"
  override def apply(g: Array[Byte]): Boolean = GeoKernels.hasArc(g)
  override def prettyName: String = "st_hasarc"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StForce2D(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_force2d"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.force2D(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.force2D($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StMemSize(child: Expression) extends GeoUnaryInt {
  override def kernel: String = "memSize"
  override def apply(g: Array[Byte]): Int = GeoKernels.memSize(g)
  override def prettyName: String = "st_memsize"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsTWKB(geom, decimaldigits) — compact delta/varint interchange. */
case class StAsTwkb(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_astwkb"
  override protected def nullSafeEval(g: Any, p: Any): Any =
    GeoKernels.asTwkb(g.asInstanceOf[Array[Byte]], p.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, p) => s"${GeoExpr.K}.asTwkb($g, $p)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_GeomFromTWKB(bytes) — parse TWKB (SRID 0). */
case class StGeomFromTwkb(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "geomFromTwkb"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.geomFromTwkb(g)
  override def prettyName: String = "st_geomfromtwkb"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_TriangulatePolygon — constrained Delaunay triangle collection. */
case class StTriangulatePolygon(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "triangulatePolygon"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.triangulatePolygon(g)
  override def prettyName: String = "st_triangulatepolygon"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_LineInterpolatePoints(line, frac, repeat) — POINT or MULTIPOINT
  * at every multiple of frac; null for non-lines. */
case class StLineInterpolatePoints(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, BooleanType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_lineinterpolatepoints"
  override protected def nullSafeEval(g: Any, f: Any, r: Any): Any =
    GeoKernels.lineInterpolatePoints(g.asInstanceOf[Array[Byte]],
      f.asInstanceOf[Double], r.asInstanceOf[Boolean])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, f, r) => s"""
      ${ev.value} = ${GeoExpr.K}.lineInterpolatePoints($g, $f, $r);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_SwapOrdinates(geom, spec) — remap x/y by a 2-char spec. */
case class StSwapOrdinates(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_swapordinates"
  override protected def nullSafeEval(g: Any, s: Any): Any =
    GeoKernels.swapOrdinates(g.asInstanceOf[Array[Byte]], s.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"${GeoExpr.K}.swapOrdinates($g, $s.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_AsGML(version, geom) — GML 2/3 fragment. */
case class StAsGml(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_asgml"
  override protected def nullSafeEval(v: Any, g: Any): Any =
    UTF8String.fromString(
      GeoKernels.asGml(v.asInstanceOf[Int], g.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, g) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${GeoExpr.K}.asGml($v, $g))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Azimuth — north-based clockwise bearing (radians) from point a to
  * point b; null when the points coincide or inputs are not points. */
case class StAzimuth(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_azimuth"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = GeoKernels.azimuth(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}Boxed = ${GeoExpr.K}.azimuth($a, $b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Perimeter — boundary length of areal geometry, 0 for points and
  * lines (distinct from ST_Length, which measures lines). */
case class StPerimeter(child: Expression) extends GeoUnaryDouble {
  override def kernel: String = "perimeter"
  override def apply(g: Array[Byte]): Double = GeoKernels.perimeter(g)
  override def prettyName: String = "st_perimeter"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// ---------------------------------------------------------------------------
// predicates
// ---------------------------------------------------------------------------

abstract class GeoBinaryPredicate extends BinaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  def kernel: String
  def apply(a: Array[Byte], b: Array[Byte]): Boolean
  override protected def nullSafeEval(a: Any, b: Any): Any =
    apply(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.$kernel($a, $b)")
}

/** ST_Intersects (reference src/function/intersects.rs:48-132). */
case class StIntersects(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "intersects"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.intersects(a, b)
  override def prettyName: String = "st_intersects"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Covers (reference src/function/covers.rs:50-122). */
case class StCovers(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "covers"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.covers(a, b)
  override def prettyName: String = "st_covers"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_CoveredBy (reference src/function/covered_by.rs:49-121). */
case class StCoveredBy(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "coveredBy"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.coveredBy(a, b)
  override def prettyName: String = "st_coveredby"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Equals — topological equality (reference src/function/equals.rs:50-148). */
case class StEquals(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "equalsTopo"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.equalsTopo(a, b)
  override def prettyName: String = "st_equals"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Contains — interior-touching containment (PostGIS-standard extra). */
case class StContains(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "contains"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.contains(a, b)
  override def prettyName: String = "st_contains"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Within — converse of ST_Contains (PostGIS-standard extra). */
case class StWithin(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "within"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.within(a, b)
  override def prettyName: String = "st_within"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_DWithin(a, b, dist) — within cartesian distance (PostGIS-standard extra). */
case class StDWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_dwithin"
  override protected def nullSafeEval(a: Any, b: Any, d: Any): Any =
    GeoKernels.dWithin(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, d) => s"${GeoExpr.K}.dWithin($a, $b, $d)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

abstract class GeoBinaryGeometry extends BinaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  def kernel: String
  def apply(a: Array[Byte], b: Array[Byte]): Array[Byte]
  override protected def nullSafeEval(a: Any, b: Any): Any =
    apply(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.$kernel($a, $b)")
}

/** ST_Union(a, b) — geometric union (PostGIS-standard extra). */
case class StUnion(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "union"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] = GeoKernels.union(a, b)
  override def prettyName: String = "st_union"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Intersection(a, b) — geometric intersection (PostGIS-standard extra). */
case class StIntersection(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "intersection"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] = GeoKernels.intersection(a, b)
  override def prettyName: String = "st_intersection"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Centroid (PostGIS-standard extra). */
case class StCentroid(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_centroid"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.centroid(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.centroid($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Envelope — bbox as a geometry (PostGIS-standard extra). */
case class StEnvelope(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_envelope"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.envelope(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.envelope($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// ---------------------------------------------------------------------------
// transforms
// ---------------------------------------------------------------------------

/** ST_Buffer(geom, width, quadsegs) (reference src/function/buffer.rs:59-104). */
case class StBuffer(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_buffer"
  override protected def nullSafeEval(g: Any, w: Any, q: Any): Any =
    GeoKernels.buffer(g.asInstanceOf[Array[Byte]], w.asInstanceOf[Double], q.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, w, q) => s"${GeoExpr.K}.buffer($g, $w, $q)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Translate(geom, dx, dy) (reference src/function/translate.rs:56-98). */
case class StTranslate(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_translate"
  override protected def nullSafeEval(g: Any, dx: Any, dy: Any): Any =
    GeoKernels.translate(g.asInstanceOf[Array[Byte]], dx.asInstanceOf[Double], dy.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, dx, dy) => s"${GeoExpr.K}.translate($g, $dx, $dy)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** PostGIS ST_MinimumClearance / ST_MinimumClearanceLine. */
case class StMinimumClearance(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_minimumclearance"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.minimumClearance(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.minimumClearance($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StMinimumClearanceLine(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_minimumclearanceline"
  override def nullable: Boolean = true
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.minimumClearanceLine(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      ${ev.value} = ${GeoExpr.K}.minimumClearanceLine($g);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** PostGIS ST_Node(lines): fully node the linework (split at crossings,
  * dissolve duplicates). Null for non-linear input. */
case class StNode(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_node"
  override def nullable: Boolean = true
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.nodeLines(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      ${ev.value} = ${GeoExpr.K}.nodeLines($g);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** PostGIS ST_OffsetCurve(line, dist): parallel curve, positive = left
  * of line direction. Null for non-line input. */
case class StOffsetCurve(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_offsetcurve"
  override def nullable: Boolean = true
  override protected def nullSafeEval(g: Any, d: Any): Any =
    GeoKernels.offsetCurve(g.asInstanceOf[Array[Byte]], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, d) => s"""
      ${ev.value} = ${GeoExpr.K}.offsetCurve($g, $d);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** PostGIS line editors: ST_AddPoint(line, pt[, pos]) /
  * ST_SetPoint(line, n, pt) / ST_RemovePoint(line, n). Null for
  * non-(line, point) inputs, range violations raise like PostGIS. */
case class StAddPoint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_addpoint"
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, p: Any, n: Any): Any =
    GeoKernels.addPoint(l.asInstanceOf[Array[Byte]], p.asInstanceOf[Array[Byte]],
      n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p, n) => s"""
      ${ev.value} = ${GeoExpr.K}.addPoint($l, $p, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

case class StSetPoint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_setpoint"
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, n: Any, p: Any): Any =
    GeoKernels.setPoint(l.asInstanceOf[Array[Byte]], n.asInstanceOf[Int],
      p.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, n, p) => s"""
      ${ev.value} = ${GeoExpr.K}.setPoint($l, $n, $p);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

case class StRemovePoint(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_removepoint"
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, n: Any): Any =
    GeoKernels.removePoint(l.asInstanceOf[Array[Byte]], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, n) => s"""
      ${ev.value} = ${GeoExpr.K}.removePoint($l, $n);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** PostGIS ST_LineSubstring(line, startFrac, endFrac): the part of the
  * line between the two length fractions; equal fractions → point. */
case class StLineSubstring(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_linesubstring"
  override def nullable: Boolean = true
  override protected def nullSafeEval(g: Any, s: Any, e: Any): Any =
    GeoKernels.lineSubstring(g.asInstanceOf[Array[Byte]],
      s.asInstanceOf[Double], e.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, s, e) => s"""
      ${ev.value} = ${GeoExpr.K}.lineSubstring($g, $s, $e);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Rotate(geom, theta[, ox, oy]) — counter-clockwise radians about
  * (ox, oy), default origin (0,0) supplied by the builder. */
case class StRotate(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_rotate"
  override protected def nullSafeEval(g: Any, t: Any, ox: Any, oy: Any): Any =
    GeoKernels.rotate(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double],
      ox.asInstanceOf[Double], oy.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t, ox, oy) => s"${GeoExpr.K}.rotate($g, $t, $ox, $oy)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression) = copy(a, b, c, d)
}

/** ST_Scale(geom, xfactor, yfactor) — scale about the origin. */
case class StScale(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_scale"
  override protected def nullSafeEval(g: Any, xf: Any, yf: Any): Any =
    GeoKernels.scaleGeom(g.asInstanceOf[Array[Byte]], xf.asInstanceOf[Double], yf.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, xf, yf) => s"${GeoExpr.K}.scaleGeom($g, $xf, $yf)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_LineInterpolatePoint(line, frac) — point at the clamped fraction
  * of the line's length; null for non-LineString input. */
case class StLineInterpolatePoint(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_lineinterpolatepoint"
  override protected def nullSafeEval(g: Any, f: Any): Any =
    GeoKernels.lineInterpolatePoint(g.asInstanceOf[Array[Byte]], f.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, f) => s"""
      ${ev.value} = ${GeoExpr.K}.lineInterpolatePoint($g, $f);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_LineLocatePoint(line, point) — fraction of the line's length at
  * the closest point to `point`; null for wrong types or a zero-length
  * line. */
case class StLineLocatePoint(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_linelocatepoint"
  override protected def nullSafeEval(l: Any, p: Any): Any = {
    val v = GeoKernels.lineLocatePoint(l.asInstanceOf[Array[Byte]], p.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, p) => s"""
      java.lang.Double ${ev.value}Boxed = ${GeoExpr.K}.lineLocatePoint($l, $p);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Boundary (reference src/function/boundary.rs:51-87). */
case class StBoundary(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_boundary"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.boundary(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.boundary($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Length — total linear length (PostGIS-standard extra). */
case class StLength(child: Expression) extends GeoUnaryDouble {
  override def kernel: String = "length"
  override def apply(g: Array[Byte]): Double = GeoKernels.length(g)
  override def prettyName: String = "st_length"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_IsValid — OGC validity (PostGIS-standard extra). */
case class StIsValid(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_isvalid"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.isValid(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.isValid($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_MakeValid — GeometryFixer repair (PostGIS-standard extra). */
case class StMakeValid(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_makevalid"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.makeValid(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.makeValid($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_ConvexHull (PostGIS-standard extra). */
case class StConvexHull(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_convexhull"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.convexHull(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.convexHull($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Simplify(geom, tolerance) — Douglas-Peucker (PostGIS-standard extra). */
case class StSimplify(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_simplify"
  override protected def nullSafeEval(g: Any, tol: Any): Any =
    GeoKernels.simplify(g.asInstanceOf[Array[Byte]], tol.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.simplify($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Split — reproduces the reference's boundary∪polygonize semantics and
  * its known caveat (src/function/split.rs:103-130, FIXME at :148). */
case class StSplit(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_split"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.split(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.split($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_SplitExact(geom, blade) — true PostGIS ST_Split semantics (the
  * reference's split.rs:148 FIXME fixed): polygon faces filtered to the
  * input's interior, line-by-line via noded difference, line-by-point
  * exact cuts. [[StSplit]] keeps the reference-faithful behavior. */
case class StSplitExact(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_split_exact"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.splitExact(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.splitExact($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_AsMVTGeom(geom, box2d) — 4096×4096 tile space, Y flipped
  * (reference src/function/as_mvt_geom.rs:76-102). */
case class StAsMvtGeom(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, GeoExpr.box2dType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_asmvtgeom"
  override protected def nullSafeEval(g: Any, box: Any): Any = {
    val r = box.asInstanceOf[InternalRow]
    GeoKernels.asMvtGeom(g.asInstanceOf[Array[Byte]],
      r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, box) =>
      s"""${GeoExpr.K}.asMvtGeom($g, $box.getDouble(0), $box.getDouble(1),
         $box.getDouble(2), $box.getDouble(3))""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// ---------------------------------------------------------------------------
// topological predicate family (PostGIS-standard extras: the reference ships
// intersects/covers/coveredby/equals; touches/crosses/overlaps/disjoint and
// DE-9IM relate complete the set a PostGIS user expects)
// ---------------------------------------------------------------------------

case class StTouches(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "touches"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.touches(a, b)
  override def prettyName: String = "st_touches"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StCrosses(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "crosses"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.crosses(a, b)
  override def prettyName: String = "st_crosses"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StOverlaps(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "overlaps"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.overlaps(a, b)
  override def prettyName: String = "st_overlaps"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

case class StDisjoint(left: Expression, right: Expression) extends GeoBinaryPredicate {
  override def kernel: String = "disjoint"
  override def apply(a: Array[Byte], b: Array[Byte]): Boolean = GeoKernels.disjoint(a, b)
  override def prettyName: String = "st_disjoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Relate(a, b) — DE-9IM intersection-matrix string. */
case class StRelate(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "st_relate"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    UTF8String.fromString(
      GeoKernels.relate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"UTF8String.fromString(${GeoExpr.K}.relate($a, $b))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Relate(a, b, pattern) — DE-9IM pattern test. */
case class StRelateMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType, StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_relate"
  override protected def nullSafeEval(a: Any, b: Any, p: Any): Any =
    GeoKernels.relateMatch(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      p.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, p) => s"${GeoExpr.K}.relateMatch($a, $b, $p.toString())")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

// ---------------------------------------------------------------------------
// overlay / proximity completion (PostGIS-standard extras)
// ---------------------------------------------------------------------------

/** ST_Difference(a, b) — points of a not in b. */
case class StDifference(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "difference"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] = GeoKernels.difference(a, b)
  override def prettyName: String = "st_difference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_SymDifference(a, b) — union minus intersection. */
case class StSymDifference(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "symDifference"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    GeoKernels.symDifference(a, b)
  override def prettyName: String = "st_symdifference"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_ClosestPoint(a, b) — the point ON a nearest to b. */
case class StClosestPoint(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "closestPoint"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] = GeoKernels.closestPoint(a, b)
  override def prettyName: String = "st_closestpoint"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_ShortestLine(a, b) — 2-point LineString spanning the minimum distance. */
case class StShortestLine(left: Expression, right: Expression) extends GeoBinaryGeometry {
  override def kernel: String = "shortestLine"
  override def apply(a: Array[Byte], b: Array[Byte]): Array[Byte] = GeoKernels.shortestLine(a, b)
  override def prettyName: String = "st_shortestline"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Snap(a, b, tol) — snap a's vertices to b within tolerance. */
case class StSnap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_snap"
  override protected def nullSafeEval(a: Any, b: Any, t: Any): Any =
    GeoKernels.snapGeom(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, t) => s"${GeoExpr.K}.snapGeom($a, $b, $t)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_PointOnSurface — interior point guaranteed on the geometry. */
case class StPointOnSurface(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_pointonsurface"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.pointOnSurface(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.pointOnSurface($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

// ---------------------------------------------------------------------------
// shape tests, normalization, geohash, dump
// ---------------------------------------------------------------------------

/** ST_IsClosed — null for areal/collection inputs (PostGIS convention). */
case class StIsClosed(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_isclosed"
  override protected def nullSafeEval(g: Any): Any = {
    val v = GeoKernels.isClosed(g.asInstanceOf[Array[Byte]])
    if (v == null) null else v.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      java.lang.Boolean r = ${GeoExpr.K}.isClosed($g);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.booleanValue(); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_IsSimple — no self-intersection/tangency anomalies. */
case class StIsSimple(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_issimple"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.isSimple(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.isSimple($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_IsRing — closed AND simple; null for non-LineString (PostGIS errors,
  * we follow the library's nullable-accessor convention instead). */
case class StIsRing(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_isring"
  override protected def nullSafeEval(g: Any): Any = {
    val v = GeoKernels.isRing(g.asInstanceOf[Array[Byte]])
    if (v == null) null else v.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      java.lang.Boolean r = ${GeoExpr.K}.isRing($g);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.booleanValue(); }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_FlipCoordinates — swap x/y of every vertex. */
case class StFlipCoordinates(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_flipcoordinates"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.flipCoordinates(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.flipCoordinates($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Normalize — canonical vertex order; topologically-equal geometries
  * become byte-equal, enabling exact-dedup on geometry columns. */
case class StNormalize(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_normalize"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.normalizeGeom(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.normalizeGeom($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_GeoHash(geom, precision) — base-32 geohash of the bbox center
  * (x=lon, y=lat); null outside the lon/lat domain. */
case class StGeoHash(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geohash"
  override protected def nullSafeEval(g: Any, p: Any): Any = {
    val s = GeoKernels.geohash(g.asInstanceOf[Array[Byte]], p.asInstanceOf[Int])
    if (s == null) null else UTF8String.fromString(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, p) => s"""
      String s = ${GeoExpr.K}.geohash($g, $p);
      if (s == null) { ${ev.isNull} = true; }
      else { ${ev.value} = UTF8String.fromString(s); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Dump — array of component geometries (explode() turns it into the
  * PostGIS set-returning form; flattens nested collections). */
case class StDump(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "st_dump"
  override protected def nullSafeEval(g: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GeoKernels.dumpGeoms(g.asInstanceOf[Array[Byte]]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(${GeoExpr.K}.dumpGeoms($g))")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** PostGIS ST_Subdivide as an array producer (explode for the set form):
  * parts with at most `right` vertices each, envelope-halving recursion.
  * The pre-join lever that keeps oversized polygons from hot-spotting
  * every grid cell they cover. */
case class StSubdivide(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "st_subdivide"
  override protected def nullSafeEval(g: Any, mv: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GeoKernels.subdivide(g.asInstanceOf[Array[Byte]], mv.asInstanceOf[Int])
        .asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, mv) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(${GeoExpr.K}.subdivide($g, $mv))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// ---------------------------------------------------------------------------
// hulls, triangulations, linework (PostGIS-standard extras)
// ---------------------------------------------------------------------------

abstract class GeoUnaryGeom extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  def kernel: String
  def apply(g: Array[Byte]): Array[Byte]
  override protected def nullSafeEval(g: Any): Any = apply(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.$kernel($g)")
}

/** ST_MinimumBoundingCircle — smallest enclosing circle as a polygon. */
case class StMinimumBoundingCircle(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "minimumBoundingCircle"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.minimumBoundingCircle(g)
  override def prettyName: String = "st_minimumboundingcircle"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_MinimumBoundingRadius — radius of the smallest enclosing circle. */
case class StMinimumBoundingRadius(child: Expression) extends GeoUnaryDouble {
  override def kernel: String = "minimumBoundingRadius"
  override def apply(g: Array[Byte]): Double = GeoKernels.minimumBoundingRadius(g)
  override def prettyName: String = "st_minimumboundingradius"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_OrientedEnvelope — minimum-area rotated rectangle. */
case class StOrientedEnvelope(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "orientedEnvelope"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.orientedEnvelope(g)
  override def prettyName: String = "st_orientedenvelope"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_LineMerge — sew contiguous linework into maximal LineStrings. */
case class StLineMerge(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "lineMerge"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.lineMerge(g)
  override def prettyName: String = "st_linemerge"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_UnaryUnion — dissolve the components of one geometry. */
case class StUnaryUnion(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "unaryUnion"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.unaryUnion(g)
  override def prettyName: String = "st_unaryunion"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_ConcaveHull(geom, lengthRatio) — tighter-than-convex hull. */
case class StConcaveHull(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_concavehull"
  override protected def nullSafeEval(g: Any, r: Any): Any =
    GeoKernels.concaveHull(g.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, r) => s"${GeoExpr.K}.concaveHull($g, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_DelaunayTriangles(geom, tolerance) — triangle collection. */
case class StDelaunayTriangles(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_delaunaytriangles"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.delaunayTriangles(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.delaunayTriangles($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_VoronoiPolygons(geom, tolerance) — cell collection. */
case class StVoronoiPolygons(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_voronoipolygons"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.voronoiPolygons(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.voronoiPolygons($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_CollectionExtract(geom, type): 1=points, 2=lines, 3=polygons. */
case class StCollectionExtract(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_collectionextract"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.collectionExtract(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.collectionExtract($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// ---------------------------------------------------------------------------
// array-of-geometry constructors (PostGIS ordered aggregates, array form:
// sort_array(collect_list(...)) states the order deterministically)
// ---------------------------------------------------------------------------

abstract class GeoArrayGeom extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  def kernel: String
  def apply(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte]
  override protected def nullSafeEval(a: Any): Any =
    apply(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = ${GeoExpr.K}.$kernel($a);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
}

/** ST_MakeLine(array<geom>) — coordinates in array order as one line. */
case class StMakeLine(child: Expression) extends GeoArrayGeom {
  override def kernel: String = "makeLineArr"
  override def apply(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] =
    GeoKernels.makeLineArr(a)
  override def prettyName: String = "st_makeline"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Polygonize(array<geom>) — faces of the noded linework. */
case class StPolygonize(child: Expression) extends GeoArrayGeom {
  override def kernel: String = "polygonizeArr"
  override def apply(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] =
    GeoKernels.polygonizeArr(a)
  override def prettyName: String = "st_polygonize"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Union(array<geom>) — dissolved union of the elements. */
case class StUnionArr(child: Expression) extends GeoArrayGeom {
  override def kernel: String = "unionArr"
  override def apply(a: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] =
    GeoKernels.unionArr(a)
  override def prettyName: String = "st_union_arr"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Expand(geom, d) — envelope grown by d on every side. */
case class StExpand(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_expand"
  override protected def nullSafeEval(g: Any, d: Any): Any =
    GeoKernels.expandEnv(g.asInstanceOf[Array[Byte]], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, d) => s"${GeoExpr.K}.expandEnv($g, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Project(point, dist, azimuth) — destination point (azimuth in
  * radians clockwise from north); null for non-point input. */
case class StProject(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType, DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_project"
  override protected def nullSafeEval(g: Any, d: Any, az: Any): Any =
    GeoKernels.project(g.asInstanceOf[Array[Byte]], d.asInstanceOf[Double],
      az.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, d, az) => s"""
      ${ev.value} = ${GeoExpr.K}.project($g, $d, $az);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Segmentize(geom, maxLen) — densify until no segment exceeds maxLen. */
case class StSegmentize(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_segmentize"
  override protected def nullSafeEval(g: Any, m: Any): Any =
    GeoKernels.segmentize(g.asInstanceOf[Array[Byte]], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, m) => s"${GeoExpr.K}.segmentize($g, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_AsBinary — raw untagged OGC WKB (interchange form). */
case class StAsBinary(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "asBinary"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.asBinary(g)
  override def prettyName: String = "st_asbinary"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_AsEWKB — raw untagged EWKB (SRID flag when set). */
case class StAsEwkb(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "asEwkbBin"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.asEwkbBin(g)
  override def prettyName: String = "st_asewkb"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Multi — promote single geometries to Multi*. */
case class StMulti(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "multiGeom"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.multiGeom(g)
  override def prettyName: String = "st_multi"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_SetSRID(geom, srid) — retag; 0 clears. */
case class StSetSrid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_setsrid"
  override protected def nullSafeEval(g: Any, s: Any): Any =
    GeoKernels.setSridGeom(g.asInstanceOf[Array[Byte]], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"${GeoExpr.K}.setSridGeom($g, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

abstract class GeoBinaryDouble extends BinaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  def kernel: String
  def apply(a: Array[Byte], b: Array[Byte]): Double
  override protected def nullSafeEval(a: Any, b: Any): Any =
    apply(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"${GeoExpr.K}.$kernel($a, $b)")
}

/** ST_HausdorffDistance — discrete (vertex-based) Hausdorff. */
case class StHausdorffDistance(left: Expression, right: Expression)
    extends GeoBinaryDouble {
  override def kernel: String = "hausdorffDistance"
  override def apply(a: Array[Byte], b: Array[Byte]): Double =
    GeoKernels.hausdorffDistance(a, b)
  override def prettyName: String = "st_hausdorffdistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_FrechetDistance — discrete Fréchet. */
case class StFrechetDistance(left: Expression, right: Expression)
    extends GeoBinaryDouble {
  override def kernel: String = "frechetDistance"
  override def apply(a: Array[Byte], b: Array[Byte]): Double =
    GeoKernels.frechetDistance(a, b)
  override def prettyName: String = "st_frechetdistance"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_MaximumInscribedCircle's radius, to within a tolerance. */
case class StMaxInscribedRadius(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_maxinscribedradius"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.maxInscribedRadius(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.maxInscribedRadius($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_MaximumInscribedCircle's center point. */
case class StMaxInscribedCenter(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_maxinscribedcenter"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.maxInscribedCenter(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.maxInscribedCenter($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_SnapToGrid(geom, size) — coordinates rounded to the grid. */
case class StSnapToGrid(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_snaptogrid"
  override protected def nullSafeEval(g: Any, s: Any): Any =
    GeoKernels.snapToGrid(g.asInstanceOf[Array[Byte]], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"${GeoExpr.K}.snapToGrid($g, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_ReducePrecision(geom, gridSize) — topology-preserving rounding. */
case class StReducePrecision(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_reduceprecision"
  override protected def nullSafeEval(g: Any, s: Any): Any =
    GeoKernels.reducePrecision(g.asInstanceOf[Array[Byte]], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"${GeoExpr.K}.reducePrecision($g, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

// ---------------------------------------------------------------------------
// bbox bound accessors, farthest-point family, angles, winding order
// ---------------------------------------------------------------------------

/** Envelope bound accessor (ST_XMin family) — NULL for empty input
  * (PostGIS ST_XMin of POLYGON EMPTY). Reads the decode cache's
  * already-computed envelope; no geometry copy, no boxing in codegen. */
abstract class GeoUnaryEnvBound extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  def which: Int
  override protected def nullSafeEval(g: Any): Any = {
    val v = GeoKernels.envBound(g.asInstanceOf[Array[Byte]], which)
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => s"""
      if (${GeoExpr.K}.envMissing($g)) { ${ev.isNull} = true; }
      else { ${ev.value} = ${GeoExpr.K}.envBoundPrim($g, $which); }""")
}

case class StXMin(child: Expression) extends GeoUnaryEnvBound {
  override def which: Int = 0
  override def prettyName: String = "st_xmin"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StYMin(child: Expression) extends GeoUnaryEnvBound {
  override def which: Int = 1
  override def prettyName: String = "st_ymin"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StXMax(child: Expression) extends GeoUnaryEnvBound {
  override def which: Int = 2
  override def prettyName: String = "st_xmax"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class StYMax(child: Expression) extends GeoUnaryEnvBound {
  override def which: Int = 3
  override def prettyName: String = "st_ymax"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_MaxDistance — largest vertex-pair distance; NULL for empty input. */
case class StMaxDistance(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_maxdistance"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = GeoKernels.maxDistance(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("maxDist")
      s"""
      java.lang.Double $r = ${GeoExpr.K}.maxDistance($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }"""
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_LongestLine — 2-point line realizing ST_MaxDistance; NULL for
  * empty input. */
case class StLongestLine(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_longestline"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GeoKernels.longestLine(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = ${GeoExpr.K}.longestLine($a, $b);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_Angle(P1,P2,P3[,P4]) — clockwise angle in [0,2π): at P2 from ray
  * P2→P1 to ray P2→P3 (3-point form), or from vector P1→P2 to vector
  * P3→P4 (4-point form). NULL on empty points or degenerate rays.
  * Shares ST_Azimuth's north-based clockwise convention, so
  * angle = az₂ − az₁ (mod 2π) exactly. */
case class StAngle(children: Seq[Expression])
    extends Expression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = children.map(_ => BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "st_angle"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val bs = vs.map(_.asInstanceOf[Array[Byte]])
    val r =
      if (bs.length == 3) GeoKernels.angle3(bs(0), bs(1), bs(2))
      else GeoKernels.angle4(bs(0), bs(1), bs(2), bs(3))
    if (r == null) null else r.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull = evs.map(_.isNull.toString).mkString(" || ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    val r = ctx.freshName("angle")
    val call =
      if (children.length == 3)
        s"${GeoExpr.K}.angle3(${evs(0).value}, ${evs(1).value}, ${evs(2).value})"
      else
        s"${GeoExpr.K}.angle4(${evs(0).value}, ${evs(1).value}, " +
          s"${evs(2).value}, ${evs(3).value})"
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          java.lang.Double $r = $call;
          if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
        }""")
  }
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}

/** ST_RemoveRepeatedPoints(geom, tol) — consecutive-vertex dedup within
  * tol; endpoints and ring closure preserved. */
case class StRemoveRepeatedPoints(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_removerepeatedpoints"
  override protected def nullSafeEval(g: Any, t: Any): Any =
    GeoKernels.removeRepeatedPoints(g.asInstanceOf[Array[Byte]], t.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, t) => s"${GeoExpr.K}.removeRepeatedPoints($g, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** ST_IsPolygonCW — shells clockwise, holes counter-clockwise; true for
  * non-areal geometries (PostGIS). */
case class StIsPolygonCw(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_ispolygoncw"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.isPolygonCw(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.isPolygonCw($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_IsPolygonCCW — shells counter-clockwise, holes clockwise. */
case class StIsPolygonCcw(child: Expression) extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_ispolygonccw"
  override protected def nullSafeEval(g: Any): Any =
    GeoKernels.isPolygonCcw(g.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g => s"${GeoExpr.K}.isPolygonCcw($g)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_ForcePolygonCW — rewind shells clockwise, holes counter-clockwise. */
case class StForcePolygonCw(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "forcePolygonCw"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.forcePolygonCw(g)
  override def prettyName: String = "st_forcepolygoncw"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_ForcePolygonCCW — rewind shells counter-clockwise, holes clockwise. */
case class StForcePolygonCcw(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "forcePolygonCcw"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.forcePolygonCcw(g)
  override def prettyName: String = "st_forcepolygonccw"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Unary geometry → array<geometry> producer (the ST_Dump* family —
  * explode for the set-returning form). */
abstract class GeoUnaryGeomArray extends UnaryExpression with GeoExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  def kernel: String
  def apply(g: Array[Byte]): Array[Array[Byte]]
  override protected def nullSafeEval(g: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      apply(g.asInstanceOf[Array[Byte]]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, g =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(${GeoExpr.K}.$kernel($g))")
}

/** ST_DumpPoints — every vertex as a Point, path order. */
case class StDumpPoints(child: Expression) extends GeoUnaryGeomArray {
  override def kernel: String = "dumpPoints"
  override def apply(g: Array[Byte]): Array[Array[Byte]] = GeoKernels.dumpPoints(g)
  override def prettyName: String = "st_dumppoints"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_DumpSegments — every 2-point segment of the linework paths. */
case class StDumpSegments(child: Expression) extends GeoUnaryGeomArray {
  override def kernel: String = "dumpSegments"
  override def apply(g: Array[Byte]): Array[Array[Byte]] = GeoKernels.dumpSegments(g)
  override def prettyName: String = "st_dumpsegments"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_CollectionHomogenize — simplest non-nested representation. */
case class StCollectionHomogenize(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "collectionHomogenize"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.collectionHomogenize(g)
  override def prettyName: String = "st_collectionhomogenize"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_BuildArea — areal geometry from linework; NULL when no face forms. */
case class StBuildArea(child: Expression) extends GeoUnaryGeomNullable {
  override def kernel: String = "buildArea"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.buildArea(g)
  override def prettyName: String = "st_buildarea"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_Points — all vertices as one MultiPoint (duplicates kept). */
case class StPoints(child: Expression) extends GeoUnaryGeom {
  override def kernel: String = "pointsOf"
  override def apply(g: Array[Byte]): Array[Byte] = GeoKernels.pointsOf(g)
  override def prettyName: String = "st_points"
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_GeomFromGeoHash — geohash cell as a polygon (SRID 4326); NULL on
  * invalid hashes. */
case class StGeomFromGeoHash(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_geomfromgeohash"
  override protected def nullSafeEval(h: Any): Any =
    GeoKernels.geomFromGeoHash(h.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => s"""
      ${ev.value} = ${GeoExpr.K}.geomFromGeoHash($h.toString());
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_PointFromGeoHash — geohash cell center (SRID 4326). */
case class StPointFromGeoHash(child: Expression) extends UnaryExpression
    with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "st_pointfromgeohash"
  override protected def nullSafeEval(h: Any): Any =
    GeoKernels.pointFromGeoHash(h.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => s"""
      ${ev.value} = ${GeoExpr.K}.pointFromGeoHash($h.toString());
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** ST_TileEnvelope(z, x, y) — XYZ tile bounds in Web Mercator (3857). */
case class StTileEnvelope(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_tileenvelope"
  override protected def nullSafeEval(z: Any, x: Any, y: Any): Any =
    GeoKernels.tileEnvelope(z.asInstanceOf[Int], x.asInstanceOf[Int], y.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (z, x, y) => s"${GeoExpr.K}.tileEnvelope($z, $x, $y)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** ST_Transform(geom, srid) — closed-form WGS84-family reprojection:
  * 4326 ↔ 3857 ↔ UTM (EPSG 326zz/327zz, Krüger-series transverse
  * Mercator). Other SRIDs raise. */
case class StTransform(left: Expression, right: Expression)
    extends BinaryExpression with GeoExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_transform"
  override protected def nullSafeEval(g: Any, s: Any): Any =
    GeoKernels.transformGeom(g.asInstanceOf[Array[Byte]], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, s) => s"${GeoExpr.K}.transformGeom($g, $s)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
