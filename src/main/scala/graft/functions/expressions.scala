package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.geom.Geom
import graft.grid.{CellIndex, TileGridSpec}

/** Hierarchical cell-id encode as a native Catalyst expression with
  * `doGenCode` — the batched geocode encode fuses into whole-stage
  * codegen (north-star requirement; replaces the reference's per-tile
  * rtree indexing with closed-form arithmetic).
  *
  * `CellIndex` is a top-level Scala object, so the generated Java calls
  * its static forwarder directly — straight-line, allocation-free.
  */
case class CellEncode(x: Expression, y: Expression,
                      level: Int, extentX: Double, extentY: Double)
    extends BinaryExpression {
  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_encode"

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    CellIndex.encode(xv.asInstanceOf[Double], yv.asInstanceOf[Double],
      level, extentX, extentY)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xv, yv) =>
      s"graft.grid.CellIndex.encode($xv, $yv, $level, ${extentX}D, ${extentY}D)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** Morton deinterleave of a cell id back to one grid coordinate —
  * `axis` 0 → ix, 1 → iy. The decode mirror of [[CellEncode]]: pure bit
  * arithmetic whose codegen calls the `CellIndex` static forwarder
  * directly, so cell decoding stays inside whole-stage codegen (no
  * ScalaUDF node — the round trip encode→decode is fully generated). */
case class CellCoord(cell: Expression, axis: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def child: Expression = cell
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (axis == 0) "cell_ix" else "cell_iy"

  override protected def nullSafeEval(v: Any): Any = {
    val id = v.asInstanceOf[Long]
    if (axis == 0) CellIndex.ix(id) else CellIndex.iy(id)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      if (axis == 0) s"graft.grid.CellIndex.ix($c)" else s"graft.grid.CellIndex.iy($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(cell = c)
}

/** Array of tile ids of the overlapping grid covering point (x, y) —
  * the page⨝tile spatial join reduced to per-row arithmetic over the
  * broadcastable [[TileGridSpec]] (SURVEY.md T1/T5: the "spatial join →
  * equi-join" trick). Codegen calls `spec.covering` via a reference
  * object, staying inside the whole-stage-generated projection. */
case class CoveringTiles(x: Expression, y: Expression, spec: TileGridSpec)
    extends BinaryExpression {
  override def left: Expression = x
  override def right: Expression = y
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "covering_tiles"

  override protected def nullSafeEval(xv: Any, yv: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      spec.covering(xv.asInstanceOf[Double], yv.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val specRef = ctx.addReferenceObj("tileGridSpec", spec, classOf[TileGridSpec].getName)
    defineCodeGen(ctx, ev, (xv, yv) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($specRef.covering($xv, $yv))")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** Static kernel behind [[DotProduct]] — lives in a top-level object so
  * generated Java calls the static forwarder directly. */
object DotKernel {
  /** Bit-exact replica of the HOF formulation
    * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
    *            0.0, (acc, v) => acc + v)`:
    * left-to-right double accumulation over paired elements, each
    * widened to double before the multiply. zip_with pads the shorter
    * array with nulls and `acc + null` is null forever, so the result
    * is NULL (boxed null here) iff lengths differ or any paired
    * element is null — exactly the HOF's null semantics. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val la = a.numElements(); val lb = b.numElements()
    if (la != lb) return null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Static kernel behind [[Md5Fast]]. */
object HashKernels {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  /** Lowercase-hex MD5 — byte-identical to commons-codec's
    * `DigestUtils.md5Hex` (the built-in `md5` expression's kernel),
    * but the MessageDigest is thread-local instead of
    * `MessageDigest.getInstance("MD5")` per row. */
  def md5Hex(bytes: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val d = tl.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((h(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(h(i) & 0xf)
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }
}

/** MD5 hex digest of a BINARY child — value-identical to the built-in
  * `md5` (same digest, same lowercase hex), minus its per-row
  * `MessageDigest.getInstance` (a provider lookup per row on the
  * generator hot path — the pages table computes md5(url) for every
  * row of every pages-derived query). */
case class Md5Fast(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_fast"
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.md5Hex(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Hex($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Double dot product of two numeric arrays (float or double
  * elements), replacing the interpreted `aggregate(zip_with(...))`
  * higher-order-function formulation on the ANN hot path: the HOFs
  * allocate an intermediate array and evaluate two lambdas per element
  * per row, where this expression is one straight-line loop — same
  * IEEE result bit for bit (see [[DotKernel.dot]]). Codegen'd via a
  * static call, so the surrounding projection stays whole-stage. */
case class DotProduct(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // the result can be null even for non-null inputs (length mismatch /
  // null elements), so nullable must not derive from the children —
  // codegen needs a real isNull slot
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs ARRAY<FLOAT|DOUBLE>, got $t")
  }
  private lazy val aFloat = elemIsFloat(a)
  private lazy val bFloat = elemIsFloat(b)

  override protected def nullSafeEval(av: Any, bv: Any): Any =
    DotKernel.dot(av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData], aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (av, bv) =>
      s"""java.lang.Double $boxed =
         |  graft.functions.DotKernel.dot($av, $bv, $aFloat, $bFloat);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

/** Even-odd ray-casting point-in-polygon over a flat coords array
  * (x0,y0,x1,y1,...). Interpreted (`CodegenFallback`) — polygon clipping
  * math stays out of generated Java, but the expression still sits
  * inside a codegen'd stage (SURVEY.md §4). */
case class STContainsPoint(poly: Expression, x: Expression, y: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = poly
  override def second: Expression = x
  override def third: Expression = y
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_contains_point"

  override protected def nullSafeEval(p: Any, xv: Any, yv: Any): Any =
    Geom.containsPoint(p.asInstanceOf[ArrayData].toDoubleArray(),
      xv.asInstanceOf[Double], yv.asInstanceOf[Double])

  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(poly = a, x = b, y = c)
}

/** Exact polygon-pair predicates/measures over flat coord arrays. */
case class STIntersects(a: Expression, b: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_intersects"
  override protected def nullSafeEval(av: Any, bv: Any): Any =
    Geom.intersects(av.asInstanceOf[ArrayData].toDoubleArray(),
      bv.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

/** Exact vector overlay ops (U2 ∪/∩/−, shapely union/intersection/
  * difference analogues, reference scripts/merge.py:63,92): two simple
  * polygons in, traced result rings out (outer CCW, holes CW, EXACT
  * vertices — original coordinates bit-identical, crossings at the
  * double-precision intersection points). CodegenFallback like the
  * rest of the geometry math — the kernel is [[graft.geom.Overlay]]. */
abstract class OverlayBinaryOp extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  protected def op(a: Seq[Array[Double]], b: Seq[Array[Double]]): Seq[Array[Double]]
  override protected def nullSafeEval(av: Any, bv: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      op(Seq(av.asInstanceOf[ArrayData].toDoubleArray()),
         Seq(bv.asInstanceOf[ArrayData].toDoubleArray()))
        .map(r => UnsafeArrayData.fromPrimitiveArray(r): Any).toArray)
}

case class STUnion(a: Expression, b: Expression) extends OverlayBinaryOp {
  override def left: Expression = a
  override def right: Expression = b
  override def prettyName: String = "st_union"
  override protected def op(x: Seq[Array[Double]], y: Seq[Array[Double]]): Seq[Array[Double]] =
    graft.geom.Overlay.unionOf(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

case class STIntersection(a: Expression, b: Expression) extends OverlayBinaryOp {
  override def left: Expression = a
  override def right: Expression = b
  override def prettyName: String = "st_intersection"
  override protected def op(x: Seq[Array[Double]], y: Seq[Array[Double]]): Seq[Array[Double]] =
    graft.geom.Overlay.intersection(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

case class STDifference(a: Expression, b: Expression) extends OverlayBinaryOp {
  override def left: Expression = a
  override def right: Expression = b
  override def prettyName: String = "st_difference"
  override protected def op(x: Seq[Array[Double]], y: Seq[Array[Double]]): Seq[Array[Double]] =
    graft.geom.Overlay.difference(x, y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

/** shapely-faithful buffer(0): valid ring unchanged, invalid ring
  * resolved to its even-odd interior with exact coordinates
  * ([[graft.geom.Geom.makeValid]], util.py:99-104). */
case class STMakeValid(geom: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def child: Expression = geom
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_make_valid"
  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.geom.Geom.makeValid(Seq(v.asInstanceOf[ArrayData].toDoubleArray()))
        .map(r => UnsafeArrayData.fromPrimitiveArray(r): Any).toArray)
  override protected def withNewChildInternal(c: Expression): Expression = copy(geom = c)
}

/** Exact IoU for convex polygons (clip + inclusion-exclusion) — the
  * residual predicate of the IoU dedup join (instanceprocessor.py
  * 265-294 semantics over convex crowns). */
case class PolyIoU(a: Expression, b: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_iou"
  override protected def nullSafeEval(av: Any, bv: Any): Any =
    Geom.iouConvex(av.asInstanceOf[ArrayData].toDoubleArray(),
      bv.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(a = l, b = r)
}

/** 6-parameter affine transform of a flat coords array: x' = a·x + b·y
  * + xoff, y' = d·x + e·y + yoff (the px↔world transform,
  * docs/cache.md:70-120; exact double math for fixture parity). */
case class STAffine(geom: Expression, a: Double, b: Double, d: Double,
                    e: Double, xoff: Double, yoff: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def child: Expression = geom
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_affine"
  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Geom.affine(v.asInstanceOf[ArrayData].toDoubleArray(), a, b, d, e, xoff, yoff))
  override protected def withNewChildInternal(c: Expression): Expression = copy(geom = c)
}

/** Douglas–Peucker simplification (shapely simplify analogue,
  * util.py:106-109). */
case class STSimplify(geom: Expression, tolerance: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def child: Expression = geom
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_simplify"
  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Geom.simplify(v.asInstanceOf[ArrayData].toDoubleArray(), tolerance))
  override protected def withNewChildInternal(c: Expression): Expression = copy(geom = c)
}

/** Polygon centroid as [cx, cy]. */
case class STCentroid(geom: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def child: Expression = geom
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_centroid"
  override protected def nullSafeEval(v: Any): Any = {
    val (cx, cy) = Geom.centroid(v.asInstanceOf[ArrayData].toDoubleArray())
    UnsafeArrayData.fromPrimitiveArray(Array(cx, cy))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(geom = c)
}

/** COCO column-major RLE of the polygon's mask over its integer-snapped
  * bbox: returns [rows, cols, count0, count1, ...] (reference RLE
  * codec, processedinstance.py:102-147). */
case class PolyRLE(geom: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def child: Expression = geom
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_rle"
  override protected def nullSafeEval(v: Any): Any = {
    val (rows, cols, counts) =
      graft.tables.FixtureIO.polyRle(v.asInstanceOf[ArrayData].toDoubleArray())
    UnsafeArrayData.fromPrimitiveArray(Array(rows, cols) ++ counts)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(geom = c)
}

/** Polygon area (shoelace) over a flat coords array. */
case class STArea(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_area"
  override protected def nullSafeEval(v: Any): Any =
    Geom.area(v.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SIGNED shoelace area (CCW +, CW −): summing it over an overlay
  * result's rings yields the polygon-with-holes area directly (outer
  * rings positive, hole rings negative — [[graft.geom.Overlay]] traces
  * holes CW), which unsigned st_area cannot express. */
case class STSignedArea(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "st_signed_area"
  override protected def nullSafeEval(v: Any): Any =
    Geom.signedArea(v.asInstanceOf[ArrayData].toDoubleArray())
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
