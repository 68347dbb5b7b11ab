package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.Haversine

/** Geo-sargability rewrite — the optimizer half of the PostGIS
  * `ST_DWithin` story (the reference's geo column exists to serve radius
  * queries, models.py:44): a predicate
  * `haversine_km(lat, lon, LAT0, LON0) <= R` with a literal center and
  * radius cannot push into a columnar scan (trig over two columns), so a
  * plain radius query reads EVERY row. This rule conjoins the classic
  * bounding-box pre-filter (Matuschek, "Finding points within a distance
  * of a coordinate"): |Δlat| bounded by the spherical meridian arc,
  * |Δlon| by asin(sin(r/R)/cos(maxLat-in-box)) — a strict SUPERSET of
  * the circle on the same sphere model the [[Haversine]] kernel uses, so
  * results are untouched while the added range predicates are sargable
  * and reach `PushedFilters` in the parquet scan. At 100 TB the
  * difference is a pruned scan vs a full-corpus trig pass.
  *
  * Conservative guards: a non-positive or non-finite radius, or a
  * center outside the canonical coordinate ranges (|lat0| > 90,
  * |lon0| > 180, or non-finite — where the Matuschek derivation's
  * cos(lat0) ≥ 0 premise breaks), yields no rewrite; a circle wrapping
  * a pole (sin(r/R) ≥ cos(lat0)) falls back to the lat bound alone.
  * A Δlon interval crossing the antimeridian emits the WRAPPED
  * disjunction (lon ≥ lo+360 OR lon ≤ hi) — two sargable ranges, still
  * pushable (data-source filter translation handles Or of comparisons),
  * assuming canonical-range lon data like the box itself does.
  * Idempotent under the optimizer's fixpoint: predicates already
  * present (semantically) are not re-added. */
object HaversineBoxRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Spherical km per degree of arc: π·R/180 on the kernel's sphere. */
  private val KmPerDeg = math.Pi * graft.functions.GeoMath.EarthRadiusKm / 180.0

  private def num(e: Expression): Option[Double] =
    if (e.foldable && (e.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]))
      Option(e.eval()).collect { case n: Number => n.doubleValue() }
    else None

  private def boxFor(
      lat: Expression, lon: Expression,
      lat0: Double, lon0: Double, r: Double): Option[Expression] = {
    if (!(r > 0) || !java.lang.Double.isFinite(r) || r >= math.Pi * graft.functions.GeoMath.EarthRadiusKm)
      return None
    // canonical-center guard: past ±90 cos(lat0) goes negative, which
    // would pass the sinRatio < 1 check with a NEGATIVE asin and emit a
    // contradictory (lonLo > lonHi) bound that filters every row; a NaN
    // center would emit NaN literals with the same effect
    if (!java.lang.Double.isFinite(lat0) || math.abs(lat0) > 90.0 ||
        !java.lang.Double.isFinite(lon0) || math.abs(lon0) > 180.0)
      return None
    val dLat = r / KmPerDeg + 1e-9
    val latLo = lat0 - dLat
    val latHi = lat0 + dLat
    val latPred = And(
      GreaterThanOrEqual(lat, Literal(latLo)), LessThanOrEqual(lat, Literal(latHi)))
    // max |Δlon| on the circle occurs at the tangent latitude, giving
    // Δlon = asin(sin(r/R)/cos(lat0)) (Matuschek) — valid only while
    // the circle stays inside a hemisphere (r/R < π/2; past that
    // sin(r/R) shrinks while the circle keeps widening, so the formula
    // would UNDER-cover — caught by GeoBoxPropertySpec). When the
    // ratio reaches 1 the circle wraps a pole and every longitude is
    // inside; both cases fall back to the lat bound alone.
    val rOverR = r / graft.functions.GeoMath.EarthRadiusKm
    if (rOverR >= math.Pi / 2) return Some(latPred)
    val sinRatio = math.sin(rOverR) / math.cos(math.toRadians(lat0))
    if (!(sinRatio < 1.0)) return Some(latPred)
    val dLon = math.toDegrees(math.asin(sinRatio)) + 1e-9
    val lo = lon0 - dLon
    val hi = lon0 + dLon
    if (2 * dLon >= 360.0) Some(latPred) // interval covers every longitude
    else if (lo >= -180.0 && hi <= 180.0)
      Some(And(latPred, And(
        GreaterThanOrEqual(lon, Literal(lo)), LessThanOrEqual(lon, Literal(hi)))))
    else if (lo < -180.0) // wraps west: [lo+360, 180] ∪ [-180, hi]
      Some(And(latPred, Or(
        GreaterThanOrEqual(lon, Literal(lo + 360.0)), LessThanOrEqual(lon, Literal(hi)))))
    else // wraps east: [lo, 180] ∪ [-180, hi-360]
      Some(And(latPred, Or(
        GreaterThanOrEqual(lon, Literal(lo)), LessThanOrEqual(lon, Literal(hi - 360.0)))))
  }

  /** A radius conjunct in either argument order (haversine is symmetric:
    * the literal center may sit in the first or second coordinate pair)
    * and either comparison direction. */
  private def boxOf(conjunct: Expression): Option[Expression] = {
    def fromCall(h: Haversine, r: Double): Option[Expression] = h match {
      case Haversine(lat, lon, la0, lo0) =>
        (num(la0), num(lo0), num(lat), num(lon)) match {
          case (Some(a), Some(o), _, _) => boxFor(lat, lon, a, o, r)
          case (None, None, Some(a), Some(o)) => boxFor(la0, lo0, a, o, r)
          case _ => None
        }
    }
    conjunct match {
      case LessThanOrEqual(h: Haversine, rE) => num(rE).flatMap(fromCall(h, _))
      case LessThan(h: Haversine, rE) => num(rE).flatMap(fromCall(h, _))
      case GreaterThanOrEqual(rE, h: Haversine) => num(rE).flatMap(fromCall(h, _))
      case GreaterThan(rE, h: Haversine) => num(rE).flatMap(fromCall(h, _))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(boxOf)
        .flatMap(splitConjunctivePredicates)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (extras.isEmpty) f
      else f.copy(condition = extras.foldLeft(cond)(And(_, _)))
  }
}
