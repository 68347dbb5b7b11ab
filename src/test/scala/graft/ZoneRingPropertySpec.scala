package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The stored-zone ray cast under the same exact-rational adversary as
  * [[GeoPolygonPropertySpec]] — but over EVERY ring in
  * `Queries.ZoneDefs`, including the non-convex and the overlapping
  * ones — and, since r15, the AXIS-ALIGNED rectangle whose top edge
  * sits at a reachable half-integer latitude: the float crossing
  * formula the `ltss_geo_zones` join (and `GeoMath.insideRing`, the
  * streaming twin's kernel) evaluates must agree point-for-point with
  * a division-free ray caster in exact Long arithmetic over DOUBLED
  * coordinates. Vertices and fixture points live on the half-integer
  * lattice, so ×2 lands everything on the integer lattice and every
  * crossing decision is a sign-aware integer cross-product with no
  * rounding anywhere — including the degenerate ray EXACTLY AT a
  * horizontal edge's latitude, where the exact caster skips the edge
  * by the same straddle gate the float side short-circuits on. */
object ZoneRingPropertySpec extends Properties("ZoneRing") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val zones = graft.operators.Queries.ZoneDefs

  private def insideExact(ring: Seq[(Double, Double)], lat2: Long, lon2: Long): Boolean = {
    val vs = (ring :+ ring.head).map { case (x, y) =>
      (math.round(2.0 * x), math.round(2.0 * y)) }
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

  property("zone construction: >= 3 half-integer-lattice vertices, nonzero shoelace area") =
    org.scalacheck.Prop {
      zones.forall { case (_, _, vs) =>
        val shoelace = (vs :+ vs.head).sliding(2).collect {
          case Seq((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1
        }.sum
        vs.size >= 3 && shoelace != 0.0 &&
          vs.forall { case (x, y) =>
            2.0 * x == math.floor(2.0 * x) && 2.0 * y == math.floor(2.0 * y) }
      }
    }

  property("the adversary exercises horizontal edges: some ring carries one, at a reachable half-integer latitude") =
    org.scalacheck.Prop {
      zones.exists { case (_, _, vs) =>
        (vs :+ vs.head).sliding(2).exists {
          case Seq((_, y1), (_, y2)) => y1 == y2 && 2.0 * y1 != 2.0 * math.floor(y1)
          case _ => false
        }
      }
    }

  private val latIdx = Gen.choose(-90, 89)
  private val lonIdx = Gen.choose(-180, 179)

  property("GeoMath.insideRing == exact-rational ray cast, every ring, every half-integer point") =
    forAll(latIdx, lonIdx) { (la, lo) =>
      val lat = la.toDouble + 0.5
      val lon = lo.toDouble + 0.5
      zones.forall { case (_, _, ring) =>
        graft.functions.GeoMath.insideRing(ring, lat, lon) ==
          insideExact(ring, 2L * la + 1, 2L * lo + 1)
      }
    }

  property("containment implies the stored bbox — the write-time prune is a true superset") =
    forAll(latIdx, lonIdx) { (la, lo) =>
      val lat = la.toDouble + 0.5
      val lon = lo.toDouble + 0.5
      zones.forall { case (_, _, ring) =>
        val inBox = lat >= ring.map(_._2).min && lat <= ring.map(_._2).max &&
          lon >= ring.map(_._1).min && lon <= ring.map(_._1).max
        inBox || !graft.functions.GeoMath.insideRing(ring, lat, lon)
      }
    }
}
