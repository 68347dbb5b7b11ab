package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The convex-hull boundary under algorithmic cross-examination: the
  * collinear-inclusive monotone chain `ltss_geo_hull` compiles per
  * segment ([[graft.operators.Queries.hullBoundary]]) must agree
  * point-for-point with the SUPPORT-LINE DEFINITION the DuckDB oracle
  * evaluates — a position is on the hull boundary iff some line
  * through it and another position has every position on one closed
  * side (single positions trivially boundary). Both sides run exact
  * Long arithmetic, so any disagreement is an algorithmic bug, not
  * rounding. Random multisets exercise duplicates, full collinearity,
  * and interior points; the square-plus-center fixture pins the
  * interior-drop concretely. */
object HullPropertySpec extends Properties("HullBoundary") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private def supportLineBoundary(pos: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val ps = pos.distinct
    if (ps.size <= 1) return ps.toSet
    ps.filter { p =>
      ps.exists { a =>
        a != p && {
          val crosses = ps.map(r =>
            (a._1 - p._1) * (r._2 - p._2) - (a._2 - p._2) * (r._1 - p._1))
          crosses.forall(_ >= 0L) || crosses.forall(_ <= 0L)
        }
      }
    }.toSet
  }

  private val point: Gen[(Long, Long)] = for {
    x <- Gen.choose(-12L, 12L)
    y <- Gen.choose(-12L, 12L)
  } yield (x, y)

  property("monotone chain == support-line definition on random multisets") =
    forAll(Gen.nonEmptyListOf(point)) { pos =>
      graft.operators.Queries.hullBoundary(pos) == supportLineBoundary(pos)
    }

  property("collinear multisets keep every distinct position") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-20L, 20L))) { xs =>
      val pos = xs.map(x => (x, 3 * x + 1))
      graft.operators.Queries.hullBoundary(pos) == pos.toSet
    }

  property("square + strict interior points: corners and edge-collinear kept, interior dropped") =
    org.scalacheck.Prop {
      val square = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
      val onEdge = (5L, 0L)
      val interior = Seq((5L, 5L), (1L, 9L), (9L, 1L))
      val got = graft.operators.Queries.hullBoundary(
        square ++ Seq(onEdge) ++ interior)
      got == (square :+ onEdge).toSet
    }
}
