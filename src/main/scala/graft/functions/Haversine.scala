package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle distance in km (the PostGIS `ST_Distance`-over-geography
  * analog for the reference's location column, models.py:44).
  *
  * A native Catalyst expression with `doGenCode` — the generated code is a
  * static method call, so the whole-stage codegen span stays unbroken
  * (unlike a Scala UDF, which boxes and breaks the span).
  */
case class Haversine(
    lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
  extends QuaternaryExpression with Serializable {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects 4 DOUBLE args, got ${children.map(_.dataType.simpleString).mkString(", ")}")

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GeoMath.haversineKm(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoMath.haversineKm($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)

  override def prettyName: String = "haversine_km"
}

object Haversine {
  /** Column-API entry point — embeds the expression directly so it
    * resolves in whatever session analyzes the plan (no registry
    * dependency; SQL users go through
    * [[graft.plans.GraftExtensions]]). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    import org.apache.spark.sql.GraftColumns.{columnOf, expressionOf}
    columnOf(Haversine(
      expressionOf(lat1), expressionOf(lon1), expressionOf(lat2), expressionOf(lon2)))
  }
}

/** Static math target for both interpreted eval and generated code. */
object GeoMath {
  final val EarthRadiusKm = 6371.0088

  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Even-odd ray cast over a stored ring `(x = lon, y = lat)` — the
    * SAME expression tree per crossing as the SQL/Column forms
    * (`Queries.geoPolygon`/`geoZones`), evaluated with identical JVM
    * double arithmetic, so a streaming consumer's verdicts match the
    * batch join bit-for-bit. The straddle gate `(y1 > lat) != (y2 >
    * lat)` SHORT-CIRCUITS the slope division (Scala `&&`, the textbook
    * rule): a HORIZONTAL edge fails the gate for every ray, so its 0/0
    * slope is never evaluated and axis-aligned rings (rectangles — the
    * most common real zone) are first-class inputs. The Column/SQL
    * twins encode the same short-circuit as nested `when`/CASE. */
  def insideRing(ring: Seq[(Double, Double)], lat: Double, lon: Double): Boolean = {
    val closed = ring :+ ring.head
    val crossings = closed.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) =>
        ((y1 > lat) != (y2 > lat)) &&
          lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
      case _ => false
    }
    crossings % 2 == 1
  }

  /** Squared point-to-SEGMENT distance in planar coordinate units —
    * the SAME expression tree as `ltss_geo_zone_nearest`'s per-edge
    * Column/SQL forms (projection identity d² = |p−a|² − t²/len² under
    * the clamp CASE; t ≤ 0 → |p−a|², t ≥ len² → |p−b|², degenerate
    * edge → |p−a|²), evaluated with identical JVM double arithmetic.
    * On half-integer-lattice inputs every operand is exact and the one
    * division is correctly rounded — property-proven against an
    * exact-rational adversary in ZoneDistancePropertySpec. */
  def pointSegD2(
      px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax
    val dy = by - ay
    val len2 = dx * dx + dy * dy
    val tn = (px - ax) * dx + (py - ay) * dy
    val pa2 = (px - ax) * (px - ax) + (py - ay) * (py - ay)
    if (len2 == 0.0 || tn <= 0.0) pa2
    else if (tn >= len2) (px - bx) * (px - bx) + (py - by) * (py - by)
    else pa2 - tn * tn / len2
  }
}
