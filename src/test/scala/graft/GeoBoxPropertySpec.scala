package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.GeoMath

/** The one property the [[graft.plans.HaversineBoxRule]] rewrite rests
  * on: the derived bounding box must be a SUPERSET of the haversine
  * circle — a point inside the circle that falls outside the box would
  * be silently DROPPED from every radius query the rule touches. The
  * box arithmetic is re-derived here exactly as the rule computes it
  * (center-validity guard, meridian-arc lat bound, Matuschek asin lon
  * bound, pole fallback, wrapped antimeridian disjunction) and checked
  * against the kernel's own haversine over arbitrary centers — including
  * out-of-range ones, which must yield NO rewrite — radii, and points. */
object GeoBoxPropertySpec extends Properties("HaversineBox") {

  // the superset property guards result correctness — sample it harder
  // than the scalacheck default
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val KmPerDeg = math.Pi * GeoMath.EarthRadiusKm / 180.0

  private sealed trait LonBound
  private case object AllLon extends LonBound
  private final case class LonRange(lo: Double, hi: Double) extends LonBound
  /** The wrapped disjunction: lon ≥ geq OR lon ≤ leq. */
  private final case class LonWrapped(geq: Double, leq: Double) extends LonBound

  /** The rule's box, re-derived: None = no rewrite at all. */
  private def box(lat0: Double, lon0: Double, r: Double)
      : Option[(Double, Double, LonBound)] = {
    if (!(r > 0) || !java.lang.Double.isFinite(r) ||
        r >= math.Pi * GeoMath.EarthRadiusKm) return None
    if (!java.lang.Double.isFinite(lat0) || math.abs(lat0) > 90.0 ||
        !java.lang.Double.isFinite(lon0) || math.abs(lon0) > 180.0) return None
    val dLat = r / KmPerDeg + 1e-9
    val latLo = lat0 - dLat
    val latHi = lat0 + dLat
    val rOverR = r / GeoMath.EarthRadiusKm
    if (rOverR >= math.Pi / 2) return Some((latLo, latHi, AllLon))
    val sinRatio = math.sin(rOverR) / math.cos(math.toRadians(lat0))
    if (!(sinRatio < 1.0)) return Some((latLo, latHi, AllLon))
    val dLon = math.toDegrees(math.asin(sinRatio)) + 1e-9
    val lo = lon0 - dLon
    val hi = lon0 + dLon
    val lb =
      if (2 * dLon >= 360.0) AllLon
      else if (lo >= -180.0 && hi <= 180.0) LonRange(lo, hi)
      else if (lo < -180.0) LonWrapped(lo + 360.0, hi)
      else LonWrapped(lo, hi - 360.0)
    Some((latLo, latHi, lb))
  }

  private def lonOk(lb: LonBound, pLon: Double): Boolean = lb match {
    case AllLon => true
    case LonRange(lo, hi) => pLon >= lo && pLon <= hi
    case LonWrapped(geq, leq) => pLon >= geq || pLon <= leq
  }

  private val lat = Gen.choose(-90.0, 90.0)
  private val lon = Gen.choose(-180.0, 180.0)
  // centers: mostly canonical, but ALSO out-of-range (the guard must
  // yield no rewrite there, never a contradictory bound) and biased
  // toward the antimeridian where the wrapped disjunction fires
  private val latC = Gen.frequency(
    4 -> Gen.choose(-90.0, 90.0),
    1 -> Gen.choose(-120.0, 120.0))
  private val lonC = Gen.frequency(
    3 -> Gen.choose(-180.0, 180.0),
    1 -> Gen.choose(170.0, 180.0),
    1 -> Gen.choose(-180.0, -170.0))
  private val radius = Gen.choose(0.001, 15000.0) // up to ~antipodal

  property("every point inside the circle is inside the box") =
    forAll(latC, lonC, radius, lat, lon) { (lat0, lon0, r, pLat, pLon) =>
      val d = GeoMath.haversineKm(pLat, pLon, lat0, lon0)
      box(lat0, lon0, r) match {
        case None => true // no rewrite: the original predicate stands alone
        case Some((latLo, latHi, lb)) =>
          d > r || (pLat >= latLo && pLat <= latHi && lonOk(lb, pLon))
      }
    }

  property("out-of-range centers are never rewritten") =
    forAll(Gen.oneOf(Gen.choose(90.0001, 150.0), Gen.choose(-150.0, -90.0001)),
      lon, radius) { (lat0, lon0, r) =>
      box(lat0, lon0, r).isEmpty
    }

  property("antimeridian-crossing intervals keep a pruning lon bound (wrapped, not dropped)") =
    forAll(Gen.choose(-60.0, 60.0),
      Gen.oneOf(Gen.choose(177.0, 180.0), Gen.choose(-180.0, -177.0)),
      Gen.choose(100.0, 800.0)) { (lat0, lon0, r) =>
      box(lat0, lon0, r) match {
        case Some((_, _, lb)) => lb != AllLon
        case None => false // canonical center + modest radius must rewrite
      }
    }

  property("the box is not vacuous: some outside-circle point is excluded at mid-latitudes") =
    forAll(Gen.choose(-60.0, 60.0), Gen.choose(-90.0, 90.0),
      Gen.choose(10.0, 500.0)) { (lat0, lon0, r) =>
      box(lat0, lon0, r) match {
        case Some((latLo, latHi, lb)) =>
          // a point well north of the box must be excluded by the lat bound
          val far = latHi + 5.0
          far > 90.0 || !(far >= latLo && far <= latHi) && lb != AllLon
        case None => false
      }
    }
}
