package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Makes the LSH skew policy BINDING at the production cap: a synthesized
  * hot band larger than [[Dedup.MaxLshBucket]] must be excluded from the
  * banded pair join (tier 1), routed to the exact-Jaccard overflow
  * verifier when within the hard bound (tier 2), and deliberately dropped
  * above it (tier 3). */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  // 1010 identical boilerplate docs (> MaxLshBucket = 1000: every band
  // bucket they form is hot) plus one genuine near-dup pair of distinct ids
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val hot = (0L until 1010L).map(i => (i, "common boiler plate text shared by all"))
    // exact duplicates: both bands collide for certain, so the pair is
    // guaranteed to surface through the small-bucket join path
    val pair = Seq(
      (5000L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5001L, "alpha beta gamma delta epsilon zeta eta theta"))
    (hot ++ pair).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("tier 1: the >cap hot band is excluded from the banded pair join") {
    val pairs = Dedup.minhashLsh.run(spark, dir)
    val got = pairs.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.contains((5000L, 5001L)), "the small-bucket near-dup pair must survive")
    assert(!got.exists { case (a, b) => a < 1010L || b < 1010L },
      s"hot-band docs leaked into the pair join: ${got.take(5).mkString(", ")}")
  }

  test("tier 2: hot band within the hard bound routes to the exact overflow verifier") {
    val verified = Dedup.lshOverflowVerify(spark, dir,
      cap = Dedup.MaxLshBucket, hardMax = 1100, minJaccard = 0.9)
    // all 1010 hot docs are identical → every pair is jaccard 1.0
    assert(verified.count() == 1010L * 1009L / 2L)
    assert(verified.agg(min(col("jaccard"))).head().getDouble(0) == 1.0)
  }

  test("tier 3: hot band above the hard bound is deliberately dropped") {
    val dropped = Dedup.lshOverflowVerify(spark, dir,
      cap = Dedup.MaxLshBucket, hardMax = Dedup.MaxLshBucket, minJaccard = 0.9)
    assert(dropped.count() == 0)
  }

  test("clustering still succeeds with the hot band excluded") {
    val clusters = Dedup.clusters.run(spark, dir).collect()
    val ids = clusters.map(_.getLong(0)).toSet
    assert(ids == Set(5000L, 5001L), s"only the small-bucket pair clusters; got $ids")
  }
}
