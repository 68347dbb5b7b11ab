package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.DetMath

/** Similarity search over the `embeddings` table (Array[Float], 64-dim).
  *
  * Brute-force cosine top-k is the baseline (one broadcast of the query
  * vector, a codegen'd arithmetic scan, and a TakeOrdered — no shuffle of
  * the data side, linear at any scale). IVF is the scale path: assign
  * every vector to its nearest centroid once (small broadcast join), then
  * probe only the query's cluster — at 100 TB the assignment is a
  * one-shuffle materialized layout and probes touch 1/k of the data.
  *
  * All vector math via [[DetMath]] left-assoc chains for oracle parity.
  */
object Similarity {

  private val Dim = 64

  /** Brute-force cosine top-k: query = embedding of vec_id 0. */
  val cosineTopk = OracleQuery(
    "sim_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cosine", DetMath.cosineCol(col("embedding"), col("qe"), Dim))
        .select(col("vec_id"), col("label"), col("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    },
    Some(s"""SELECT e.vec_id, e.label,
      |  ${DetMath.cosineSql("e.embedding", "q.qe", Dim)} AS cosine
      |FROM embeddings e,
      |     (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
      |WHERE e.vec_id <> 0
      |ORDER BY cosine DESC, e.vec_id
      |LIMIT 10""".stripMargin))

  /** IVF-style clustering: 4 fixed centroids (vec_id 0..3), every vector
    * assigned to its max-cosine centroid (deterministic tie-break on
    * centroid id), cluster sizes + top-3 members per cluster. */
  val ivf = OracleQuery(
    "sim_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val scored = emb.crossJoin(broadcast(cents))
        .withColumn("cos", DetMath.cosineCol(col("embedding"), col("ce"), Dim))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
      val assigned = scored
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"), col("cos"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cid")).orderBy(col("cos").desc, col("vec_id"))
      assigned
        .withColumn("rank_in_cluster", row_number().over(wc))
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cid"))))
        .filter(col("rank_in_cluster") <= 3)
        .select(col("cid"), col("cluster_size"), col("rank_in_cluster"), col("vec_id"), col("cos"))
        .orderBy(col("cid"), col("rank_in_cluster"))
    },
    Some(s"""WITH scored AS (
      |  SELECT e.vec_id, c.vec_id AS cid,
      |    ${DetMath.cosineSql("e.embedding", "c.embedding", Dim)} AS cos
      |  FROM embeddings e, embeddings c WHERE c.vec_id < 4
      |), assigned AS (
      |  SELECT vec_id, cid, cos FROM (
      |    SELECT vec_id, cid, cos,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      |    FROM scored) WHERE rn = 1
      |)
      |SELECT cid, cluster_size, rank_in_cluster, vec_id, cos FROM (
      |  SELECT cid, vec_id, cos,
      |         row_number() OVER (PARTITION BY cid ORDER BY cos DESC, vec_id) AS rank_in_cluster,
      |         CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size
      |  FROM assigned)
      |WHERE rank_in_cluster <= 3
      |ORDER BY cid, rank_in_cluster""".stripMargin))

  /** Embedding-cosine near-dup detection with random-hyperplane-style
    * LSH: bucket = the sign pattern of the first 8 dimensions (axis-
    * aligned hyperplanes — deterministic and SQL-expressible), candidates
    * join within buckets only, exact cosine verifies. At 100 TB the
    * bucket join touches ~1/256 of the pair space; recall loss is the
    * usual LSH trade and is identical in the oracle. */
  val embedNearDup = {
    def bucketSqlOf(v: String) = (1 to 8)
      .map(i => s"CASE WHEN $v[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")
    OracleQuery(
      "dedup_embedding",
      (s, d) => {
        val bucket = concat((1 to 8).map(i =>
          when(element_at(col("embedding"), i) >= 0f, "1").otherwise("0")): _*)
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), bucket.as("bucket"))
        val a = e.toDF("a_id", "a_e", "bucket")
        val b = e.toDF("b_id", "b_e", "bucket")
        a.join(b, "bucket")
          .filter(col("a_id") < col("b_id"))
          .withColumn("cosine", DetMath.cosineCol(col("a_e"), col("b_e"), Dim))
          .filter(col("cosine") >= 0.2)
          .select(col("a_id"), col("b_id"), col("cosine"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some(s"""WITH e AS (
        |  SELECT vec_id, embedding, ${bucketSqlOf("embedding")} AS bucket
        |  FROM embeddings
        |)
        |SELECT a_id, b_id, cosine FROM (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |         ${DetMath.cosineSql("a.embedding", "b.embedding", Dim)} AS cosine
        |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |WHERE cosine >= 0.2
        |ORDER BY a_id, b_id""".stripMargin))
  }

  val all: Seq[OracleQuery] = Seq(cosineTopk, ivf, embedNearDup)
}
