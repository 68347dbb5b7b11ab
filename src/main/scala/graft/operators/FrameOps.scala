package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared frame-shape devices for the operator modules. */
private[graft] object FrameOps {

  /** Global aggregates over a TINY frame, carried on the same pass that
    * collects the frame: ONE aggregate gathers the rows (collect_list
    * of the full struct) plus the named stats, then re-explodes, so
    * every input row reappears with every stat column attached. This is
    * the warning-free single-partition alternative to a partitionless
    * window — Spark 4's `EliminateWindowPartitions` folds constant
    * partition keys away, so `partitionBy(lit(1))` still trips
    * WindowExec's alarm — without the second input-lineage execution a
    * `crossJoin(broadcast(df.agg(...)))` would cost (a second corpus
    * scan when the frame is an aggregate of one). Use ONLY on bounded
    * frames (a grouped rollup, a k-row report): everything funnels
    * through one reducer by design, which is exactly the shape the
    * bounded frame already had. */
  def withGlobalStats(df: DataFrame, stats: (String, Column)*): DataFrame = {
    require(stats.nonEmpty, "withGlobalStats needs at least one named stat")
    val cols = df.columns.toSeq
    val aggs = collect_list(struct(cols.map(col): _*)).as("rows") +:
      stats.map { case (n, c) => c.as(n) }
    df.agg(aggs.head, aggs.drop(1): _*)
      .select(explode(col("rows")).as("r") +: stats.map(st => col(st._1)): _*)
      .select(cols.map(c => col(s"r.$c")) ++ stats.map(st => col(st._1)): _*)
  }
}
