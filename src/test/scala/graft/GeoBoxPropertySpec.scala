package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.GeoMath

/** The one property the [[graft.plans.HaversineBoxRule]] rewrite rests
  * on: the derived bounding box must be a SUPERSET of the haversine
  * circle — a point inside the circle that falls outside the box would
  * be silently DROPPED from every radius query the rule touches. The
  * box arithmetic is re-derived here exactly as the rule computes it
  * (meridian-arc lat bound, Matuschek asin lon bound, pole/antimeridian
  * fallbacks) and checked against the kernel's own haversine over
  * arbitrary centers, radii, and points. */
object GeoBoxPropertySpec extends Properties("HaversineBox") {

  // the superset property guards result correctness — sample it harder
  // than the scalacheck default
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val KmPerDeg = math.Pi * GeoMath.EarthRadiusKm / 180.0

  /** The rule's box, re-derived: (latLo, latHi, Option[(lonLo, lonHi)]). */
  private def box(lat0: Double, lon0: Double, r: Double)
      : (Double, Double, Option[(Double, Double)]) = {
    val dLat = r / KmPerDeg + 1e-9
    val latLo = lat0 - dLat
    val latHi = lat0 + dLat
    val rOverR = r / GeoMath.EarthRadiusKm
    if (rOverR >= math.Pi / 2) return (latLo, latHi, None)
    val sinRatio = math.sin(rOverR) / math.cos(math.toRadians(lat0))
    if (!(sinRatio < 1.0)) (latLo, latHi, None)
    else {
      val dLon = math.toDegrees(math.asin(sinRatio)) + 1e-9
      if (lon0 - dLon < -180.0 || lon0 + dLon > 180.0) (latLo, latHi, None)
      else (latLo, latHi, Some((lon0 - dLon, lon0 + dLon)))
    }
  }

  private val lat = Gen.choose(-90.0, 90.0)
  private val lon = Gen.choose(-180.0, 180.0)
  private val radius = Gen.choose(0.001, 15000.0) // up to ~antipodal

  property("every point inside the circle is inside the box") =
    forAll(lat, lon, radius, lat, lon) { (lat0, lon0, r, pLat, pLon) =>
      val d = GeoMath.haversineKm(pLat, pLon, lat0, lon0)
      val (latLo, latHi, lonBounds) = box(lat0, lon0, r)
      d > r || {
        val latOk = pLat >= latLo && pLat <= latHi
        val lonOk = lonBounds.forall { case (lo, hi) => pLon >= lo && pLon <= hi }
        latOk && lonOk
      }
    }

  property("the box is not vacuous: some outside-circle point is excluded at mid-latitudes") =
    forAll(Gen.choose(-60.0, 60.0), Gen.choose(-90.0, 90.0),
      Gen.choose(10.0, 500.0)) { (lat0, lon0, r) =>
      val (latLo, latHi, lonBounds) = box(lat0, lon0, r)
      // a point well north of the box must be excluded by the lat bound
      val far = latHi + 5.0
      far > 90.0 || !(far >= latLo && far <= latHi) && lonBounds.nonEmpty
    }
}
