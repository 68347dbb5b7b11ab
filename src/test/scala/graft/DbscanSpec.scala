package graft

import org.apache.spark.sql.functions._
import graft.operators.{Queries, TimeSeries}

/** Hand-computed fixtures for the r13 trajectory/cleaning operators —
  * independent of the DuckDB oracles (the oracle proves engine parity;
  * these prove the SEMANTICS against a by-hand trace).
  *
  * DBSCAN fixture (eps 2, minPts 3), worked by hand:
  *
  * {{{
  *   ids 1-4 at (0,0),(1,0),(0,1),(1,1): all pairwise d² ≤ 2 ≤ 4 →
  *     each neighbors the other three → all CORE, one cluster labeled 1
  *     (min id). id 2 additionally neighbors id 5 (d² = 4) → degree 4.
  *   id 5 at (3,0): d² to (1,0) = 4 ✓, to (1,1) = 5 ✗, to (0,0) = 9 ✗
  *     → 1 neighbor → BORDER of cluster 1 (core neighbor id 2).
  *   id 6 at (10,10): no neighbor → NOISE, cluster −1.
  *   id 7 at (30,0) with 8 at (30,2), 9 at (30,−2): 7 has 2 neighbors
  *     (d² = 4 each; 8↔9 d² = 16 ✗) → CORE; 8 and 9 have 1 each →
  *     BORDER. 7 has NO core neighbor → the isolated-core path must
  *     self-label (cluster 7), and 8, 9 attach to it.
  * }}}
  */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  test("dbscan: hand-traced roles and labels, including the isolated core") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (5L, 3L, 0L), (6L, 10L, 10L),
      (7L, 30L, 0L), (8L, 30L, 2L), (9L, 30L, -2L)
    ).toDF("id", "x", "y")
    val got = Queries.dbscan(pts, eps = 2L, minPts = 3)
      .select("id", "n_nbrs", "role", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val want = Seq(
      (1L, 3L, "core", 1L), (2L, 4L, "core", 1L),
      (3L, 3L, "core", 1L), (4L, 3L, "core", 1L),
      (5L, 1L, "border", 1L), (6L, 0L, "noise", -1L),
      (7L, 2L, "core", 7L), (8L, 1L, "border", 7L), (9L, 1L, "border", 7L))
    assert(got.toSeq == want)
  }

  /** Co-located points, worked by hand against the UNCONTRACTED
    * definition (every point counts its eps-neighbors individually):
    *
    * {{{
    *   ids 1,2,3 at (0,0): mutual distance-0 neighbors (2 each) plus
    *     id 4 at d² = 4 ✓ → n_nbrs 3 ≥ minPts−1 = 2 → all CORE, one
    *     clique, cluster 1 (min id).
    *   id 4 at (2,0): neighbors ids 1,2,3 (d² = 4) AND id 5 (d² = 4)
    *     → n_nbrs 4 → CORE; core-core edges to the clique → cluster 1.
    *   id 5 at (4,0): d² to (2,0) = 4 ✓, to (0,0) = 16 ✗ → 1 neighbor
    *     → BORDER, attaches to id 4's cluster 1.
    *   ids 6,7 at (10,10): mutual distance-0 neighbors only → n_nbrs 1
    *     < 2 → neither core, no core within eps → both NOISE. This is
    *     the case that catches a naive "mult ≥ minPts ⇒ core" shortcut.
    * }}}
    *
    * The position-contracted implementation must reproduce this trace
    * exactly — multiplicity feeds the neighbor COUNT, never the core
    * rule directly. */
  test("dbscan: co-located points — weighted degree, clique labels, duplicate noise") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 2L, 0L), (5L, 4L, 0L),
      (6L, 10L, 10L), (7L, 10L, 10L)
    ).toDF("id", "x", "y")
    val got = Queries.dbscan(pts, eps = 2L, minPts = 3)
      .select("id", "n_nbrs", "role", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val want = Seq(
      (1L, 3L, "core", 1L), (2L, 3L, "core", 1L), (3L, 3L, "core", 1L),
      (4L, 4L, "core", 1L), (5L, 1L, "border", 1L),
      (6L, 1L, "noise", -1L), (7L, 1L, "noise", -1L))
    assert(got.toSeq == want)
  }

  /** Negative coordinates — the quantized lat/lon query's cells go
    * below zero, which the lattice query's pmod coordinates never did.
    * Truncating `div` makes cell 0 span {-1, 0, 1} (width 3) while
    * every other cell spans eps=2; the 3×3 candidate join stays
    * correct because every cell is ≥ eps wide, and this chain crosses
    * zero at every seam: (-3,-1) meet via cells -1|0, (-1,1) inside
    * cell 0, (1,3) via cells 0|1. Hand trace (eps 2, minPts 3):
    * degrees 1,2,2,1 → cores are ids 2,3 (mutual neighbors → one
    * cluster labeled min core id 2); ids 1,4 are borders of it. */
  test("dbscan: negative cells — candidate join adjacency across zero") {
    val pts = Seq(
      (1L, -3L, 0L), (2L, -1L, 0L), (3L, 1L, 0L), (4L, 3L, 0L)
    ).toDF("id", "x", "y")
    val got = Queries.dbscan(pts, eps = 2L, minPts = 3)
      .select("id", "n_nbrs", "role", "cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, "border", 2L), (2L, 2L, "core", 2L),
      (3L, 2L, "core", 2L), (4L, 1L, "border", 2L)))
  }

  test("dbscan: all-noise input never reaches the CC loop with labels") {
    val pts = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L)).toDF("id", "x", "y")
    val got = Queries.dbscan(pts, eps = 2L, minPts = 3)
      .select("id", "role", "cluster")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "noise", -1L), (2L, "noise", -1L), (3L, "noise", -1L)))
  }

  test("heading classifier: all 9 compass classes, diagonal ownership, magnitude tiebreak") {
    val cases = Seq(
      (1.0, 0.0, "N"), (-1.0, 0.0, "S"), (0.0, 1.0, "E"), (0.0, -1.0, "W"),
      (1.0, 1.0, "NE"), (1.0, -1.0, "NW"), (-1.0, 1.0, "SE"), (-1.0, -1.0, "SW"),
      (0.0, 0.0, "STAY"),
      // magnitude decides off-diagonal displacements
      (3.0, -2.0, "N"), (-2.0, 3.0, "E"), (2.0, -3.0, "W"), (-3.0, 2.0, "S"),
      // the 45° boundary belongs to the diagonal class at any scale
      (0.5, -0.5, "NW"), (-2.5, -2.5, "SW"))
    val df = cases.toDF("dlat", "dlon", "want")
      .withColumn("got", Queries.headingClass(col("dlat"), col("dlon")))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
  }

  /** Hampel trace, by hand (entity "purchase.1", cents in brackets):
    * series 10, 10, 10, 100, 10, 10, 10. Row 4 (value 100): window
    * [10,10,100,10,10] → sorted cents [1000,1000,1000,1000,10000],
    * median 1000, deviations sorted [0,0,0,0,9000] → MAD 0; dev 9000 >
    * 3·0 → SPIKE, filtered = 10.0. Rows 3 and 5 see the spike inside
    * their windows but their own deviation is 0 → clean. Rows 1, 2, 6,
    * 7 have 3- or 4-sample windows → pass through unflagged by the
    * boundary contract. */
  test("hampel: hand-traced spike replacement and boundary passthrough") {
    val t0 = 1700000000000000L
    val mk = (i: Int, v: String) =>
      ("purchase.1", new java.sql.Timestamp((t0 + i * 1000000L) / 1000L), v)
    val df = (1 to 7).map(i => mk(i, if (i == 4) "100.00" else "10.00"))
      .toDF("entity_id", "time", "state")
    val got = TimeSeries.hampel(df)
      .select("n_window", "is_spike", "filtered")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = Seq(
      (3L, 0, 10.0), (4L, 0, 10.0), (5L, 0, 10.0),
      (5L, 1, 10.0), // the spike: flagged, replaced by the window median
      (5L, 0, 10.0), (4L, 0, 10.0), (3L, 0, 10.0))
    assert(got.toSeq == want)
  }

  /** Threshold strictness: window [9,10,13,10,11] → median 10, devs
    * sorted [0,0,1,1,3] → MAD 1; the center's deviation is exactly
    * 3 = 3·MAD — NOT a spike (strict >), the Hampel convention. */
  test("hampel: deviation exactly at 3·MAD is not a spike") {
    val t0 = 1700000000000000L
    val vals = Seq("9.00", "10.00", "13.00", "10.00", "11.00")
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("purchase.2", new java.sql.Timestamp((t0 + i * 1000000L) / 1000L), v)
    }.toDF("entity_id", "time", "state")
    val center = TimeSeries.hampel(df)
      .filter(col("n_window") === 5).collect()
    assert(center.length == 1)
    assert(center.head.getAs[Int]("is_spike") == 0)
    assert(center.head.getAs[Double]("filtered") == 13.0)
  }
}
