package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * [[Column]] API (the `ExpressionUtils` conversions are `private[sql]`,
  * so this forwarder lives in the `org.apache.spark.sql` package — the
  * standard technique for extension libraries that define their own
  * expressions).
  *
  * graft builds Columns from expressions DIRECTLY at the use site rather
  * than installing named functions into a session registry and calling
  * `call_function`: a registry install on `SparkSession.active` silently
  * misses when a multi-session application analyzes the frame in a
  * different session, while a directly-embedded expression resolves in
  * whatever session runs the plan. (SQL-surface registration via
  * [[graft.plans.GraftExtensions]] remains for `spark.sql(...)` users.) */
object GraftColumns {
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Eagerly free the block storage behind a `localCheckpoint`'d frame.
    * `Dataset.unpersist` is a NO-OP for these: the checkpoint blocks
    * belong to the underlying RDD's `LocalRDDCheckpointData`, which is
    * never registered with the CacheManager that `unpersist` consults.
    * The checkpointed Dataset's plan is a [[execution.LogicalRDD]]
    * wrapping exactly that RDD — unpersisting IT releases the blocks
    * now instead of waiting for the driver GC + ContextCleaner to
    * notice the RDD is unreachable. Returns true when a checkpointed
    * RDD was found and released (false = not a checkpointed frame —
    * caller's plan shape changed, worth an assertion in specs). */
  def freeLocalCheckpoint(ds: Dataset[_]): Boolean = ds match {
    case d: classic.Dataset[_] =>
      d.queryExecution.analyzed match {
        case l: execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
          true
        case _ => false
      }
    case _ => false
  }
}
