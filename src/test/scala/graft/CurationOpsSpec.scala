package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, TextOps}

/** Unit coverage for the cluster keep-policy and the bigram-coherence
  * quality signal beyond the oracle gate: the oracle pins fixture values;
  * these pin the SEMANTIC invariants on hand-built corpora and on the
  * sf0.001 fixture. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigram coherence: exact conditional ratios and the ≤1 bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-coh").toString
    // corpus bigrams: "x y"×2, "x z"×1 → prefix "x" count 3;
    // singleton doc "q" degenerates to its own 1-element shingle set
    Seq((1L, "s", "x y"), (2L, "s", "x y"), (3L, "s", "x z"), (4L, "s", "q"))
      .toDF("doc_id", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.docCoherence.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 2.0 / 3.0),
      (2L, 1L, 2.0 / 3.0),
      (3L, 1L, 1.0 / 3.0),
      (4L, 1L, 1.0)))
  }

  test("surprisal: hand-computed floor-log2 bits on a known unigram model") {
    val dir = java.nio.file.Files.createTempDirectory("graft-surp").toString
    // corpus: "a a a a b b c d" → N = 8; c(a)=4, c(b)=2, c(c)=c(d)=1
    // bits = floor(log2(N // c)): a → log2(2)=1, b → log2(4)=2, c/d → log2(8)=3
    Seq((1L, "a a a a"), (2L, "b b c"), (3L, "d"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.docSurprisal.run(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == (4L, 4L, 1L, 1.0))          // 4 tokens × 1 bit
    assert(out(2L) == (3L, 7L, 3L, 7.0 / 3.0))    // 2×2 + 3 bits
    assert(out(3L) == (1L, 3L, 3L, 3.0))          // the rarest token
  }

  test("equi-depth histogram: equal-count buckets with exact bounds") {
    // one domain, 16 castable values 1..16 → ntile(8) gives 8 buckets
    // of exactly 2, bucket i covering [2i−1, 2i]
    val rows = (1 to 16).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), i.toLong, i.toLong, 3L))
    val dir = java.nio.file.Files.createTempDirectory("graft-eqd").toString
    rows.toDF("ts", "event_id", "user_id", "x")
      .selectExpr("ts", "event_id", "user_id", "CAST(event_id AS DOUBLE) AS value",
        "'click' AS event_type", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Queries.histEqdepth.run(spark, dir)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.length == 8)
    for ((b, n, lo, hi) <- out) {
      assert(n == 2L, s"bucket $b must hold exactly 2 rows")
      assert(lo == 2.0 * b - 1 && hi == 2.0 * b, s"bucket $b bounds ($lo, $hi)")
    }
  }

  test("compression plan: run counting over the (entity, time) layout order") {
    // entity a.1 states over time: 5,5,7,7,7,5 → 3 runs; b.1: 9 → 1 run
    val rows = Seq("5", "5", "7", "7", "7", "5").zipWithIndex.map { case (s, i) =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:0$i:00"), 1L, 1L, s)
    } :+ ((java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2L, 2L, "9"))
    val dir = java.nio.file.Files.createTempDirectory("graft-cmp").toString
    rows.toDF("ts", "event_id", "user_id", "s")
      .selectExpr("ts", "event_id", "user_id", "CAST(s AS DOUBLE) AS value",
        "'a' AS event_type", "'{}' AS props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Queries.compressPlan.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(out == Seq(("a", 7L, 2L, 4L, 3L, 7.0 / 4.0)),
      s"run accounting diverged: $out")
  }

  test("known-item MRR: a planted stealer with the same rare shingles halves rr") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mrr").toString
    // probe ids are doc_id % 25 == 0. Doc 0's rare shingles appear ONLY
    // in doc 0 → rank 1. Doc 25 shares its full text with doc 7 (the
    // stealer, lower id → wins the score tie) → rank 2, rr = 0.5.
    val filler = (1 to 6).map(i => (i.toLong, s"filler doc number $i body words $i"))
    val docs = Seq(
      (0L, "unique alpha beta gamma delta"),
      (25L, "stolen phrase one two three"),
      (7L, "stolen phrase one two three")) ++ filler
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Retrieval.knownItemMrr.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(out(0L) == ((1, 1.0)), s"unique probe must rank 1: $out")
    assert(out(25L) == ((2, 0.5)), s"duplicated probe must lose rank 1 to the stealer: $out")
  }

  test("bigram coherence is in (0, 1] for every fixture document") {
    val bad = TextOps.docCoherence.run(spark, "/root/testdata/sf0.001")
      .filter(col("coherence") <= 0.0 || col("coherence") > 1.0)
      .count()
    assert(bad == 0L)
  }

  test("keep-best selects exactly one member per cluster, by (n_tokens, -doc_id)") {
    val kept = Dedup.keepBest.run(spark, "/root/testdata/sf0.001")
    // same membership as the min-id clustering (the keep POLICY changes,
    // the component structure must not)
    val clusters = Dedup.clusters.run(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("cluster"))
    assert(kept.select("doc_id", "cluster").except(clusters).isEmpty &&
      clusters.except(kept.select("doc_id", "cluster")).isEmpty)
    // exactly one survivor per cluster
    val perCluster = kept.groupBy(col("cluster"))
      .agg(sum(col("kept")).as("n_kept")).filter(col("n_kept") =!= 1)
    assert(perCluster.isEmpty)
    // the survivor maximizes (n_tokens, -doc_id) within its cluster
    val best = kept
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster"))
          .orderBy(col("n_tokens").desc, col("doc_id"))))
      .filter((col("rk") === 1) =!= (col("kept") === 1))
    assert(best.isEmpty)
  }

  test("leakage-free split: one split per near-dup cluster, covers every doc") {
    val sf = "/root/testdata/sf0.001"
    val out = Dedup.splitLeakageFree.run(spark, sf)
    // every doc assigned exactly once
    assert(out.count() == Tables.documents(spark, sf).count())
    // a group never straddles splits (the structural guarantee)
    val straddling = out.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1)
    assert(straddling.isEmpty)
    // and the audit measures that zero over the candidate edge set,
    // while the naive doc-hash rule leaks on this fixture
    val audit = Dedup.splitLeakageAudit.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit("cluster")._2 == 0L)
    assert(audit("cluster")._1 == audit("doc_hash")._1)
  }

  test("corpus_zipf returns an empty frame on an empty corpus (no empty.max crash)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-corpus").toString
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("corpus_zipf")(spark, dir)
    assert(out.columns.toSeq ==
      Seq("rank", "token", "freq", "rank_freq", "ratio_to_top"))
    assert(out.collect().isEmpty,
      "the degenerate corpus must yield the oracle's empty frame, not a crash")
  }
}
