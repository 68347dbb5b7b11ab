package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Queries.{convoyCoreEpisodes, ConvoyHourRow}

/** The laminar-fast-path CMC kernel under algorithmic cross-examination:
  * [[graft.operators.Queries.convoyCoreEpisodes]] skips nested classes
  * once a superset survives (the r19 optimization that turned a
  * 30-minute folded probe into seconds) — this property pins it
  * output-identical to the NAIVE candidate-set CMC, re-derived here
  * from the documented semantics with plain immutable Sets and none of
  * the kernel's machinery (no laminarity, no covered-marking, no
  * array keys). Random worlds draw members, hours (with gaps), and a
  * random partition of the present members per hour, so the generator
  * exercises churn, merges, splits, absences, and gap closures the
  * hand fixtures cannot enumerate. */
object ConvoyCorePropertySpec extends Properties("convoyCoreEpisodes") {

  /** The reference CMC: candidates as member-sets with min start;
    * per hour each candidate partitions by its members' component,
    * the identical piece survives, a changed set closes (emit at
    * ≥ k members / ≥ m hours), ≥ k pieces inherit the start, every
    * ≥ k component opens unless the set is already alive, gaps close
    * everything. Mirrors the design-time Python brute force. */
  private def naive(
      world: Map[Long, Map[Long, Long]], // hr -> member -> gid
      k: Int, m: Int): Set[(String, Long, Long)] = {
    val out = scala.collection.mutable.Set.empty[(String, Long, Long)]
    def emit(s: Set[Long], st: Long, e: Long): Unit =
      if (s.size >= k && e - st + 1 >= m)
        out += ((s.toSeq.sorted.mkString(","), st, e))
    var state = Map.empty[Set[Long], Long]
    var prev = Long.MinValue
    for (h <- world.keys.toSeq.sorted) {
      if (prev != Long.MinValue && h != prev + 1) {
        state.foreach { case (s, st) => emit(s, st, prev) }
        state = Map.empty
      }
      val gidOf = world(h)
      var next = Map.empty[Set[Long], Long]
      state.foreach { case (s, st) =>
        val pieces = s.flatMap(mm => gidOf.get(mm).map(g => (g, mm)))
          .groupBy(_._1).values.map(_.map(_._2)).toSeq
        if (!pieces.exists(_ == s)) emit(s, st, prev)
        pieces.foreach { p =>
          if (p.size >= k)
            next = next.updated(p, math.min(next.getOrElse(p, Long.MaxValue), st))
        }
      }
      gidOf.groupBy(_._2).values.map(_.keySet).foreach { c =>
        if (c.size >= k && !next.contains(c)) next = next.updated(c, h)
      }
      state = next
      prev = h
    }
    state.foreach { case (s, st) => emit(s, st, prev) }
    out.toSet
  }

  /** A random world: ≤ 8 members, ≤ 7 hours with gaps, and per hour a
    * random grouping of a random subset of members into components
    * (gid = each component's min member — the production convention). */
  private val worldGen: Gen[Map[Long, Map[Long, Long]]] = for {
    nMem <- Gen.choose(3, 8)
    hours <- Gen.someOf(0L to 9L).map(_.toSeq.sorted)
    perHour <- Gen.sequence[Seq[Map[Long, Long]], Map[Long, Long]](
      hours.map { _ =>
        for {
          present <- Gen.someOf(0L until nMem.toLong)
          // random component id per member, then relabel to min-member
          raw <- Gen.listOfN(present.size, Gen.choose(0, 2))
        } yield {
          val byComp = present.toSeq.zip(raw).groupBy(_._2)
          byComp.values.flatMap { grp =>
            val mems = grp.map(_._1)
            val gid = mems.min
            mems.map(_ -> gid)
          }.toMap
        }
      })
  } yield hours.zip(perHour).toMap

  property("laminar fast-path == naive candidate-set CMC") =
    forAll(worldGen) { world =>
      val rows = world.toSeq.flatMap { case (hr, gidOf) =>
        gidOf.toSeq.map { case (mem, gid) => ConvoyHourRow(0L, hr, gid, mem) }
      }
      val fast = convoyCoreEpisodes(rows.iterator, 3, 2)
        .map(e => (e.members, e.hr_start, e.hr_end)).toSet
      val ref = naive(world.map { case (h, g) => h -> g }, 3, 2)
      fast == ref
    }

  property("k=2 edge: pair cores behave identically") =
    forAll(worldGen) { world =>
      val rows = world.toSeq.flatMap { case (hr, gidOf) =>
        gidOf.toSeq.map { case (mem, gid) => ConvoyHourRow(0L, hr, gid, mem) }
      }
      val fast = convoyCoreEpisodes(rows.iterator, 2, 2)
        .map(e => (e.members, e.hr_start, e.hr_end)).toSet
      val ref = naive(world, 2, 2)
      fast == ref
    }
}
