package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The point-to-segment distance kernel under an exact-rational
  * adversary, the [[ZoneRingPropertySpec]] convention: the float
  * formula `ltss_geo_zone_nearest` evaluates per edge
  * ([[graft.functions.GeoMath.pointSegD2]] — the identical expression
  * tree) must agree with BigInt fraction arithmetic over DOUBLED
  * coordinates on every lattice input, both in the CLAMP BRANCH it
  * takes (an exact sign decision — any divergence is a real bug, not
  * rounding) and in the value (exact when the projection is clamped to
  * an endpoint; within 1 ulp-class relative error through the single
  * division otherwise).
  *
  * With P, A, B on the half-integer lattice, X = 2·x lands on the
  * integer lattice and, in scaled integers, tnS = (P−A)·(B−A),
  * len2S = |B−A|², pa2S = |P−A|² are exact Longs with
  * d² = (pa2S·len2S − tnS²) / (4·len2S) an exact rational. */
object ZoneDistancePropertySpec extends Properties("ZoneDistance") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  // half-integer lattice coordinates in the fixture's coordinate box
  private val coord2: Gen[Long] = Gen.choose(-360L, 360L) // doubled units

  private def d(v2: Long): Double = v2.toDouble / 2.0

  property("float kernel matches the exact rational on every lattice (point, segment)") =
    forAll(coord2, coord2, coord2, coord2, coord2, coord2) {
      (px2, py2, ax2, ay2, bx2, by2) =>
        // exact side, scaled integers (doubled coords -> Longs)
        val dxS = bx2 - ax2; val dyS = by2 - ay2
        val len2S = dxS * dxS + dyS * dyS
        val tnS = (px2 - ax2) * dxS + (py2 - ay2) * dyS
        val pa2S = (px2 - ax2) * (px2 - ax2) + (py2 - ay2) * (py2 - ay2)
        val pb2S = (px2 - bx2) * (px2 - bx2) + (py2 - by2) * (py2 - by2)
        // float side: the query's expression tree
        val got = graft.functions.GeoMath.pointSegD2(
          d(px2), d(py2), d(ax2), d(ay2), d(bx2), d(by2))
        if (len2S == 0L || tnS <= 0L) {
          // clamp to A: the float branch decision is the same exact
          // sign test (tn = tnS/4 exactly), and pa2 = pa2S/4 exactly
          got == pa2S.toDouble / 4.0
        } else if (tnS >= len2S) {
          got == pb2S.toDouble / 4.0
        } else {
          // interior projection: d² = (pa2S·len2S − tnS²)/(4·len2S)
          // exactly; the float path rounds once in the division and
          // once in the subtraction
          val exact = (BigDecimal(BigInt(pa2S) * BigInt(len2S) - BigInt(tnS) * BigInt(tnS))
            / BigDecimal(4L * len2S)).toDouble
          val tol = math.max(math.ulp(pa2S.toDouble / 4.0) * 4.0, 1e-12)
          math.abs(got - exact) <= tol &&
            // the true distance is never negative and never exceeds
            // either endpoint distance — the clamp's geometric contract
            got >= -tol && got <= math.min(pa2S, pb2S).toDouble / 4.0 + tol
        }
    }

  property("degenerate segment (A = B) reduces to the point distance exactly") =
    forAll(coord2, coord2, coord2, coord2) { (px2, py2, ax2, ay2) =>
      val got = graft.functions.GeoMath.pointSegD2(
        d(px2), d(py2), d(ax2), d(ay2), d(ax2), d(ay2))
      val pa2S = (px2 - ax2) * (px2 - ax2) + (py2 - ay2) * (py2 - ay2)
      got == pa2S.toDouble / 4.0
    }
}
