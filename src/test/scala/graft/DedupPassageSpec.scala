package graft

import graft.operators.Dedup

/** Hand-computed fixture for the passage-duplication filter: corpus-wide
  * occurrence counts, per-document ratios, tail/short-doc handling, and
  * within-document repetition all pinned. */
class DedupPassageSpec extends SparkSpec {
  import spark.implicits._

  test("passage stats: corpus-wide counts, per-doc ratio, short docs pass") {
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val A = words("a", 16); val B = words("b", 16); val C = words("c", 16)
    val D = words("d", 16); val E = words("e", 16); val F = words("f", 16)
    val docs = Seq(
      (0L, s"$A $B"),          // shares passage A with doc 1
      (1L, s"$A $C"),
      (2L, s"$D $E xx yy zz"), // the 3-word tail is not a passage
      (3L, words("s", 10)),    // shorter than one passage: 0 passages, kept
      (4L, s"$F $F")           // repeats its OWN passage: corpus count 2
    ).toDF("doc_id", "text")
    val out = Dedup.passageStats(docs).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSeq
    assert(out == Seq(
      (0L, 2L, 1L, 0.5, 1),
      (1L, 2L, 1L, 0.5, 1),
      (2L, 2L, 0L, 0.0, 1),
      (3L, 0L, 0L, 0.0, 1),
      (4L, 2L, 2L, 1.0, 0)))
  }
}
