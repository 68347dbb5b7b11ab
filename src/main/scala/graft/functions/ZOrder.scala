package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve arithmetic as native column expressions — the
  * multi-dimensional clustering key every lakehouse OPTIMIZE ZORDER uses
  * so that predicates on EITHER of two dimensions prune row groups of
  * one physical sort order (reference context: the composite
  * `(entity_id, time DESC)` index, models.py:78-80 — a B-tree serves
  * both columns only lexicographically; the Morton curve serves both
  * symmetrically, which is what survives at 100 TB where per-entity
  * partitioning is too fine and per-time chunking alone leaves every
  * chunk containing every entity).
  *
  * The 16-bit interleave runs as the classic O(log w) mask-shift spread
  * (Morton 1966; the "Part1By1" bit trick) — five shift/and/or steps per
  * dimension, all over LongType, all Spark built-ins, so the whole key
  * stays inside whole-stage codegen. No UDF, no loop.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2·i
    * (0 ≤ result < 2³²). `x` must be a non-negative integral column;
    * only its low 16 bits contribute. */
  def spread16(x: Column): Column = {
    val a = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The 32-bit Morton key of two 16-bit dimensions: `a`'s bits occupy
    * even positions, `b`'s odd — so a range of the key is a rectangle
    * walk of (a, b) space and sorting by it co-locates rows close in
    * BOTH dimensions. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference implementation for the property suite: the per-bit loop
    * the mask-shift spread must agree with everywhere. */
  private[graft] def interleaveRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a.toLong >> i) & 1L) << (2 * i)
      z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
