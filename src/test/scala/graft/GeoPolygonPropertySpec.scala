package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pins `ltss_geo_polygon`'s even-odd ray cast against an INDEPENDENT
  * exact-rational reference (r8 verdict #7). The production query
  * compiles one float CASE per non-horizontal edge; here the same
  * formula is re-derived with the same JVM double ops the codegen'd
  * chain executes, and checked against a division-free ray caster in
  * exact Long arithmetic over DOUBLED coordinates — vertices are
  * integers and fixture points half-integers, so ×2 lands everything
  * on the integer lattice and the crossing test becomes a sign-aware
  * integer cross-product with no rounding anywhere. The reference also
  * keeps horizontal edges IN (their `(y1 > lat) != (y2 > lat)` gate is
  * vacuously false), proving the production construction-time
  * exclusion equals full-polygon semantics rather than assuming it. */
object GeoPolygonPropertySpec extends Properties("GeoPolygon") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val verts = graft.operators.Queries.PolygonVerts
  private val ring = verts :+ verts.head

  /** The production formula: one float crossing test per non-horizontal
    * edge, exactly the arithmetic `Queries.geoPolygon` compiles. */
  private def insideFloat(lat: Double, lon: Double): Boolean = {
    val crossings = ring.sliding(2).collect {
      case Seq((x1, y1), (x2, y2)) if y1 != y2 => (x1, y1, x2, y2)
    }.count { case (x1, y1, x2, y2) =>
      ((y1 > lat) != (y2 > lat)) &&
        lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
    }
    crossings % 2 == 1
  }

  /** Exact reference over doubled coordinates (no division, no float):
    * `lon < (x2-x1)(lat-y1)/(y2-y1) + x1` multiplied through by the
    * edge's nonzero (y2-y1), inequality flipped when it is negative.
    * Horizontal edges stay in the loop and contribute nothing. */
  private def insideExact(lat2: Long, lon2: Long): Boolean = {
    val vs = ring.map { case (x, y) => (2L * x.toLong, 2L * y.toLong) }
    var crossings = 0
    vs.sliding(2).foreach {
      case Seq((xx1, yy1), (xx2, yy2)) =>
        if ((yy1 > lat2) != (yy2 > lat2)) {
          val lhs = (lon2 - xx1) * (yy2 - yy1)
          val rhs = (xx2 - xx1) * (lat2 - yy1)
          if (if (yy2 > yy1) lhs < rhs else lhs > rhs) crossings += 1
        }
      case _ => ()
    }
    crossings % 2 == 1
  }

  // the scaladoc's construction invariants, pinned: no horizontal edge
  // (its slope division would be 0/0), and integer-lattice vertices (so
  // a half-integer point never sits on a vertex or a horizontal edge
  // line — in doubled coords vertex y is even, point lat odd)
  property("polygon construction: no horizontal edge, integer vertices") =
    org.scalacheck.Prop {
      ring.sliding(2).forall { case Seq((_, y1), (_, y2)) => y1 != y2; case _ => true } &&
        verts.forall { case (x, y) => x == math.floor(x) && y == math.floor(y) }
    }

  private val latIdx = Gen.choose(-90, 89)
  private val lonIdx = Gen.choose(-180, 179)

  property("float ray cast == exact-rational ray cast on every half-integer point") =
    forAll(latIdx, lonIdx) { (la, lo) =>
      val lat = la.toDouble + 0.5
      val lon = lo.toDouble + 0.5
      insideFloat(lat, lon) == insideExact(2L * la + 1, 2L * lo + 1)
    }

  property("points outside the polygon's bounding box are never inside") =
    forAll(latIdx, lonIdx) { (la, lo) =>
      val lat = la.toDouble + 0.5
      val lon = lo.toDouble + 0.5
      val outsideBox = lat < 0 || lat > 40 || lon < -10 || lon > 40
      !outsideBox || !insideFloat(lat, lon)
    }
}
