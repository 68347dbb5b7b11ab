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

  test("substring spans: overlapping windows merge, a >W gap splits, within-doc repeats count") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i")       // 20 shared tokens
    val fillA = (1 to 4).map(i => s"a$i")
    val fillB = (1 to 5).map(i => s"b$i")
    val gap = (1 to 17).map(i => s"g$i")          // > W: forces a span split
    val docs = Seq(
      // doc 0: shared at offset 0 → windows 0..4 duplicated → span [0,20)
      (0L, (shared ++ fillA).mkString(" ")),
      // doc 1: shared at offset 5 → windows 5..9 → span [5,25)
      (1L, (fillB ++ shared).mkString(" ")),
      // doc 2: shared twice with a 17-token gap — WITHIN-doc duplication
      // alone also counts; two spans [0,20) and [37,57)
      (2L, (shared ++ gap ++ shared).mkString(" "))).toDF("doc_id", "text")
    val spans = graft.operators.Dedup.substringSpanStats(docs)
      .orderBy($"doc_id", $"span_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq(
      (0L, 1L, 0L, 20L, 5L),
      (1L, 1L, 5L, 25L, 5L),
      (2L, 1L, 0L, 20L, 5L),
      (2L, 2L, 37L, 57L, 5L)), s"got $spans")
  }

  test("span merge matches a reference merge on 300 random window sets") {
    // the adjacency boundary (i == prev + W extends, i == prev + W + 1
    // splits) is the kind of off-by-one a fixture misses — randomized
    // window sets, all cases in ONE Spark job (doc_id = case index)
    val W = 16
    val rnd = new scala.util.Random(7)
    val cases = (0 until 300).map { c =>
      val n = rnd.nextInt(12)
      val starts = Seq.fill(n)(rnd.nextInt(120).toLong).distinct.sorted
      c.toLong -> starts
    }.toMap
    def refMerge(starts: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
      val spans = scala.collection.mutable.ArrayBuffer.empty[List[Long]]
      for (i <- starts) {
        if (spans.nonEmpty && i <= spans.last.head + W)
          spans(spans.size - 1) = i :: spans.last
        else spans += List(i)
      }
      spans.toSeq.zipWithIndex.map { case (s, k) =>
        ((k + 1).toLong, s.min, s.max + W, s.size.toLong)
      }
    }
    val dup = cases.toSeq.flatMap { case (c, ss) => ss.map(i => (c, i)) }
      .toDF("doc_id", "i")
    val got = Dedup.mergeSpans(dup, W)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    for ((c, ss) <- cases if ss.nonEmpty) {
      assert(got.getOrElse(c, Nil) == refMerge(ss),
        s"case $c starts=$ss: got ${got.getOrElse(c, Nil)}, want ${refMerge(ss)}")
    }
    assert(cases.filter(_._2.nonEmpty).keySet == got.keySet)
  }

  test("contamination spans: only benchmark-matching windows flag, at exact offsets") {
    // the gate now yields real rows too (the bench set quotes the
    // opening windows of the ≡50 mod 100 docs), but the exact-offset
    // semantics stay pinned here on a hand-built corpus:
    // doc 100 is the benchmark (doc_id % 100 == 0); doc 1 embeds a
    // 12-token benchmark run at offset 3 → windows 3..7 → span [3,15);
    // doc 2 repeats itself but shares NOTHING with the benchmark — the
    // corpus-duplicate signal must NOT leak into the contamination report
    val bench = (1 to 12).map(i => s"q$i")
    val selfDup = (1 to 8).map(i => s"r$i")
    val dir = java.nio.file.Files.createTempDirectory("graft-contam").toString
    Seq(
      (100L, "src0", bench.mkString(" ")),
      (1L, "src1", ((1 to 3).map(i => s"x$i") ++ bench ++ Seq("tail")).mkString(" ")),
      (2L, "src1", (selfDup ++ selfDup).mkString(" ")))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = graft.operators.Dedup.contaminationSpans.run(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((1L, 1L, 3L, 15L, 5L)), s"got $spans")
  }

  test("substring spans: the W=16 tier COVERS the Lee et al. >=50-token criterion; granularity measured") {
    // Lee et al.'s suffix-array ExactSubstr excises duplicated
    // substrings of >= 50 tokens; stride-1 W-window span mass is EXACT
    // for "tokens inside a duplicated >= W-token substring" (a token in
    // such a substring sits in some duplicated W-window, and a
    // duplicated W-window IS such a substring) — so the W=50 spans are
    // the true Lee criterion, and the shipped W=16 tier must COVER them
    // (finer granularity can only add mass, never miss any)
    val dir = "/root/testdata/sf0.001"
    if (!new java.io.File(s"$dir/documents.parquet").exists())
      cancel("driver testdata fixture not present in this environment")
    val docs = Tables.documents(spark, dir)
    def spans(w: Int): Map[Long, Seq[(Long, Long)]] =
      graft.operators.Dedup.substringSpanStats(docs, w)
        .selectExpr("doc_id", "start_tok", "end_tok")
        .as[(Long, Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
    val s16 = spans(16)
    val s50 = spans(50)
    for ((doc, ss) <- s50; (st, en) <- ss; t <- st until en)
      assert(s16.getOrElse(doc, Nil).exists(x => x._1 <= t && t < x._2),
        s"token $t of doc $doc is >=50-token-duplicated but the W=16 tier missed it")
    val m16 = s16.values.flatten.map(x => x._2 - x._1).sum
    val m50 = s50.values.flatten.map(x => x._2 - x._1).sum
    assert(m50 > 0 && m50 <= m16, s"fixture must exercise both tiers: $m50 vs $m16")
    // the granularity difference ON RECORD: the extra W=16 mass is real
    // 16-49-token duplication Lee's threshold ignores, not noise
    info(f"W=16 flagged token mass: $m16; true >=50-token mass: $m50; " +
      f"precision vs the 50-token criterion: ${m50.toDouble / m16}%.3f (recall 1.0 by the check above)")
  }
}
