package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Curation-operator unit coverage beyond the oracle gate — in particular
  * the sequence-packing shard boundary, which test-SF doc_ids never cross
  * (all fixture ids live in shard 0). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("sequence packing resets the token stream at the 100k-doc shard boundary") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pack").toString
    // 3-token docs straddling the boundary, one language
    Seq(
      (99998L, "en", "a b c"),
      (99999L, "en", "d e f"),
      (100000L, "en", "g h i"),
      (100001L, "en", "j k l"))
      .toDF("doc_id", "lang", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sampling.sequencePacking.run(spark, dir)
      .select("doc_id", "shard", "start_offset", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (99998L, 0L, 0L, 0L),
      (99999L, 0L, 3L, 0L),
      (100000L, 1L, 0L, 0L), // new shard → stream offset resets
      (100001L, 1L, 3L, 0L)))
  }

  test("pack efficiency: window count, utilization, and boundary cuts by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft-packeff").toString
    // one stream: 200 + 100 tokens. Windows of 256: doc 2 starts at 200
    // and ends at 299 -> crosses the 256 boundary -> 1 cut; 300 tokens
    // occupy ceil(300/256) = 2 windows at 300*100/512 = 58% utilization.
    Seq(
      (1L, "en", Seq.fill(200)("w").mkString(" ")),
      (2L, "en", Seq.fill(100)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sampling.packEfficiency.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out == Seq(("en", 0L, 2L, 300L, 2L, 58L, 1L)))
  }

  test("temperature allocator: sqrt weights, integer quotas, epoch cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-temp").toString
    // src a: 2500 docs × 4 tokens = 10000; src b: 1 doc × 4 tokens = 4
    ((1L to 2500L).map(i => (i, "en", "a", "w x y z")) :+ (9999L, "en", "b", "w x y z"))
      .toDF("doc_id", "lang", "source", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sampling.sampleTemperature.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // w_a = floor(√10000) = 100, w_b = floor(√4) = 2, wtot = 102
    // quota_a = 100·20000/102 = 19607 (uncapped: 4 epochs of a = 40000)
    // quota_b = 2·20000/102 = 392, capped at 4 epochs of b = 16 → 400%
    assert(out == Seq(
      ("a", 10000L, 100L, 19607L, 19607L, 196L),
      ("b", 4L, 2L, 392L, 16L, 400L)))
    // allocation never exceeds the budget
    assert(out.map(_._5).sum <= Sampling.MixBudget)
  }

  test("stratified sampling keeps the smallest language whole and flattens the rest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-strat").toString
    // en 400 docs, de 100 docs → de keeps all, en targets √(100/400)=50%
    (1L to 400L).map(i => (i, "en", s"doc $i"))
      .++((1001L to 1100L).map(i => (i, "de", s"doc $i")))
      .toDF("doc_id", "lang", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sampling.sampleStratified.run(spark, dir)
      .select("lang", "n_lang", "n_sampled")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out("de") == (100L, 100L), "smallest language keeps every doc")
    val (nEn, sEn) = out("en")
    assert(nEn == 400L && sEn < 400L && math.abs(sEn - 200L) < 60L,
      s"en should land near the 50% target, got $sEn/400")
    // determinism: a second run produces identical membership counts
    val again = Sampling.sampleStratified.run(spark, dir)
      .select("lang", "n_sampled").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == out.map { case (l, (_, s)) => (l, s) })
  }

  test("soft dedup keeps every singleton and thins duplicate families toward 1/k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soft").toString
    val head = "x " * 50 // 100 chars — shared 80-char head ⇒ one family
    // 60 singletons + one 40-copy family sharing the head fingerprint
    ((1L to 60L).map(i => (i, "en", s"unique document number $i with its own words"))
      ++ (101L to 140L).map(i => (i, "en", head + s"tail $i")))
      .toDF("doc_id", "lang", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Sampling.sampleSoftDedup.run(spark, dir)
      .collect().map(r => r.getAs[Long]("dup_count") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))).toMap
    assert(out(1L) == (60L, 60L), "singletons must all survive (h mod 1 = 0)")
    val (nFam, kFam) = out(40L)
    assert(nFam == 40L)
    // E[kept] = 1; the deterministic coin should keep only a few of 40
    assert(kFam <= 5L, s"a 40-family should thin to ~1, kept $kFam")
  }
}
