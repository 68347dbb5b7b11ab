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
}
