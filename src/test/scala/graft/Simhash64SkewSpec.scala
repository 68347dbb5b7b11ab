package graft

import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextHash
import graft.operators.Dedup

/** Makes the 64-bit SimHash tier policy BINDING at the production cap
  * ([[Dedup.MaxLshBucket]] — the point of the 2¹⁶ band space):
  *
  *  - a synthesized >cap hot bucket (1010 identical docs) is excluded
  *    from the banded join, yet its exact duplicates ALL survive through
  *    the linear star tier;
  *  - a genuine hamming-1..3 near-dup pair (found by deterministic
  *    search — the kernel is a pure function, so the search result is
  *    stable) surfaces through the BANDED tier at the real cap;
  *  - the whole output equals a brute-force reference applying the
  *    documented two-tier policy to the kernel signatures.
  */
class Simhash64SkewSpec extends SparkSpec {
  import spark.implicits._

  private def sig(s: String): String = TextHash.simhash64(UTF8String.fromString(s)).toString
  private def hamming(a: String, b: String): Int =
    a.iterator.zip(b.iterator).count { case (x, y) => x != y }

  /** Deterministic search for (base, variant) with signature hamming in
    * [1,3]: base = a×8 b×4 c×2 d (the 8/4/2/1 weights make every bit
    * count odd, so appending ONE token flips exactly the +1-count bits
    * whose token hash votes −1 — a handful, not ~half the signature). */
  private lazy val (baseDoc, nearDoc, nearHamming) = {
    val found = (0 until 50).iterator.flatMap { q =>
      val base = (Seq.fill(8)(s"a$q") ++ Seq.fill(4)(s"b$q") ++
        Seq.fill(2)(s"c$q") ++ Seq(s"d$q")).mkString(" ")
      val bs = sig(base)
      (0 until 300).iterator.flatMap { i =>
        val cand = s"$base t$i"
        val h = hamming(bs, sig(cand))
        if (h >= 1 && h <= 3) Some((base, cand, h)) else None
      }
    }
    assert(found.hasNext, "no hamming-1..3 variant found — widen the search space")
    found.next()
  }

  private lazy val docs: Seq[(Long, String)] =
    (0L until 1010L).map(i => (i, "common boiler plate text shared by all")) ++
      Seq((5000L, baseDoc), (5001L, nearDoc),
        (6000L, "alpha beta gamma delta epsilon zeta eta theta"),
        (6001L, "alpha beta gamma delta epsilon zeta eta theta"))

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skew64").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val got: Set[(Long, Long, Int)] =
    Dedup.simhash64Pairs.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("banded tier fires at the real cap: the hamming-1..3 pair surfaces") {
    assert(nearHamming >= 1 && nearHamming <= 3)
    assert(got.contains((5000L, 5001L, nearHamming)),
      s"near-dup pair (hamming $nearHamming) missing from ${got.size} pairs")
  }

  test("star tier: every >cap exact duplicate survives, linearly") {
    val hot = got.filter { case (a, b, _) => a < 1010L && b < 1010L }
    assert(hot == (1L until 1010L).map(i => (0L, i, 0)).toSet,
      s"hot docs must pair only via the min-anchored star (got ${hot.size} pairs)")
    assert(got.contains((6000L, 6001L, 0)))
  }

  test("output equals the brute-force two-tier reference") {
    val sigs = docs.map { case (id, t) => id -> sig(t) }.toMap
    val bandGroups = docs.flatMap { case (id, t) =>
      (0 until 4).map(b => (b, sigs(id).substring(b * 16, (b + 1) * 16)) -> id)
    }.groupMap(_._1)(_._2)
    val bandPairs = bandGroups.values
      .filter(_.size <= Dedup.MaxLshBucket)
      .flatMap { ids =>
        val sorted = ids.sorted
        for {
          i <- sorted.indices; j <- (i + 1) until sorted.size
          h = hamming(sigs(sorted(i)), sigs(sorted(j))) if h <= 3
        } yield (sorted(i), sorted(j), h)
      }
    val starPairs = sigs.toSeq.groupMap(_._2)(_._1).values.flatMap { ids =>
      val mn = ids.min
      ids.filter(_ != mn).map(i => (mn, i, 0))
    }
    assert(got == (bandPairs ++ starPairs).toSet)
  }
}
