package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

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
  * never notice; deep graphs need ~20+ rounds and took the driver from
  * milliseconds to MINUTES per iteration (jstack: 1 011 s of 1 150 s
  * wall inside `BigInteger.multiplyToomCook3`).
  *
  * [[truncate]] replaces the r19 `freshFrame(df.localCheckpoint(...))`
  * composition: it marks the frame's `InternalRow` RDD for (local or
  * reliable) checkpointing and wraps it in a NEW `LogicalRDD` with NO
  * origin stats — the leaf reports the configured default size and the
  * compounding resets every round. Unlike r19's cut (which rebuilt
  * AFTER `Dataset.localCheckpoint`, and so ALSO lost the output
  * partitioning — measured on this Spark: the built-in checkpoint's
  * `LogicalRDD` arrives with `UnknownPartitioning` in every
  * eager/lazy × AQE mode, so every iteration re-shuffled frames the
  * loop had JUST hash-repartitioned — r19 ADVICE), the partitioning
  * and ordering are captured from the PRE-checkpoint physical plan and
  * carried into the leaf, defaulting only the stats. The remaining
  * trade: joins against a truncated frame won't auto-broadcast (size
  * reads as leaf-default/huge) — exactly right INSIDE a
  * hand-partitioned fixpoint loop, which is truncate's only caller.
  *
  * [[frameWithRowCount]] is the other half of that trade (r19 VERDICT
  * finding #1: `dedup_semantic` lost its label-frame auto-broadcast and
  * regressed 60%): once a loop CONVERGES, the no-stats discipline is no
  * longer needed, and the caller knows the exact row count (the
  * convergence aggregate counts rows in the same job). Re-attaching an
  * honest `Statistics(rows × width, rows)` lets Catalyst auto-broadcast
  * a dimension-sized label frame at every consumer — and, just as
  * honestly, refuse to broadcast a corpus-sized one at 100 TB. */
object GraftLineage {

  /** The partitioning a `LogicalRDD` can carry — a
    * `PartitioningCollection` (join outputs) narrows to its first
    * member, the rule `Dataset.checkpoint` historically applied. An
    * ADAPTIVE plan degrades to unknown: AQE may still replan its
    * exchanges (coalesce partitions, demote a shuffle) after we read
    * the declared partitioning, and a leaf that over-promises lets
    * EnsureRequirements skip an exchange the data actually needs. The
    * fixpoint loops all run under `withAqeOff`, so they keep the
    * preserved partitioning where it matters. */
  private def declaredPartitioning(
      physical: org.apache.spark.sql.execution.SparkPlan): Partitioning =
    physical match {
      case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0)
      case p => firstLeaf(p.outputPartitioning)
    }

  private def firstLeaf(p: Partitioning): Partitioning = p match {
    case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
    case other => other
  }

  private def rebuild(
      df: Dataset[Row], stats: Option[Statistics],
      mark: Option[Boolean]): Dataset[Row] = {
    val s = df.sparkSession.asInstanceOf[ClassicSession]
    val qe = df.queryExecution
    val physical = qe.executedPlan
    // copy before the block manager sees the rows: unsafe rows are
    // reused buffers, the same defensive copy Dataset.checkpoint makes
    val rdd = mark match {
      case None => qe.toRdd
      case Some(reliable) =>
        val r = qe.toRdd.map(_.copy())
        if (reliable) r.checkpoint() else r.localCheckpoint()
        r
    }
    val ordering = physical match { // same AQE caveat as the partitioning
      case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Nil
      case p => p.outputOrdering
    }
    val plan = LogicalRDD(
      qe.analyzed.output, rdd, declaredPartitioning(physical),
      ordering, isStreaming = false, None)(s, stats, None)
    ClassicDataset.ofRows(s, plan)
  }

  /** `df` truncated: its RDD marked for checkpointing (`reliable` →
    * DFS via `sc.setCheckpointDir`, else executor-local blocks, both
    * materialized lazily by the caller's next job) and wrapped in a new
    * `LogicalRDD` leaf with NO origin stats but the pre-checkpoint
    * plan's output partitioning and ordering intact — the per-round
    * reset for fixpoint loops. */
  def truncate(df: Dataset[Row], reliable: Boolean = false): Dataset[Row] =
    rebuild(df, None, Some(reliable))

  /** `df` as a new `LogicalRDD` leaf (no checkpoint marking — the
    * plan usually already sits on truncated blocks) carrying HONEST
    * statistics for a known row count (size = rows × flat row width
    * from the schema's default sizes) — the post-convergence re-attach
    * that restores auto-broadcast for dimension-sized results without
    * reviving the in-loop compounding. */
  def frameWithRowCount(df: Dataset[Row], rows: Long): Dataset[Row] = {
    val width = 8L + df.schema.map(_.dataType.defaultSize.toLong).sum
    rebuild(df, Some(Statistics(
      sizeInBytes = BigInt(math.max(1L, rows * width)),
      rowCount = Some(BigInt(math.max(0L, rows))))), None)
  }
}
