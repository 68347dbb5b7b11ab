package org.apache.spark.sql

import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Lineage/statistics surgery for iterative loops — the one place this
  * repo reaches into Spark's `private[sql]` surface (hence the package).
  *
  * WHY (r19, found by the folded-10× convoy probe melting the driver):
  * `Dataset.localCheckpoint`/`checkpoint` wrap the result in a
  * `LogicalRDD` that PRESERVES the origin plan's CBO statistics. The
  * size-only estimator (`SizeInBytesOnlyStatsPlanVisitor`) multiplies
  * join children, so an iterative loop whose round joins a frame with a
  * projection OF ITSELF (the pointer-doubling step of
  * [[graft.operators.Dedup.connectedComponents]]) SQUARES
  * `sizeInBytes` every iteration: the BigInteger's bit count doubles
  * per round (measured: 11 bits → 2.4 MILLION bits by iteration 18),
  * and every subsequent planning pass pays Toom-Cook multiplications of
  * megabit integers on the DRIVER thread. Short loops (≤ ~8 rounds)
  * never notice; the convoy meta-graph's ~720-hour chains need ~20+
  * rounds and took the driver from milliseconds to MINUTES per
  * iteration (jstack: 1 011 s of 1 150 s wall inside
  * `BigInteger.multiplyToomCook3`).
  *
  * [[freshFrame]] rebuilds the checkpointed frame as a NEW `LogicalRDD`
  * over its already-computed `InternalRow` RDD with NO origin stats —
  * the leaf reports the configured default size and the compounding
  * resets every round. The trade: joins against such a frame won't
  * auto-broadcast (size reads as unknown/huge) — exactly right inside
  * a hand-partitioned fixpoint loop, which is the only caller. */
object GraftLineage {
  def freshFrame(df: Dataset[Row]): Dataset[Row] = {
    val s = df.sparkSession.asInstanceOf[ClassicSession]
    s.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
