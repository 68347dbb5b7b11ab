package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.config.LtssConfig

/** Batch sinks for LTSS rows.
  *
  * The reference writes one PostgreSQL table, chunked into time partitions
  * by TimescaleDB (`create_hypertable('ltss','time')`, reference
  * __init__.py:337-344, chunk interval __init__.py:284-300). Here the
  * physical design maps to:
  *
  *  - **parquet/lakehouse layout**: `partitionBy(chunk)` where `chunk` is
  *    the time_bucket of the configured chunk interval (default 30 days) —
  *    Catalyst partition-prunes time-range scans exactly like chunk
  *    exclusion; plus `sortWithinPartitions(entity_id, time)` standing in
  *    for the composite `(entity_id, time DESC)` index (models.py:78-80)
  *    via parquet row-group min/max stats.
  *  - **JDBC**: micro-batch appends with per-batch transactions and
  *    bounded retry — strictly better than the reference's one
  *    row-per-transaction loop (__init__.py:207-218).
  */
object LtssSink {

  /** Derived chunk column (partition key), e.g. `chunk=2024-01-01` for a
    * 30-day interval. */
  def chunkCol(cfg: LtssConfig) = {
    val us = cfg.chunkTimeIntervalUs
    to_date(timestamp_micros(unix_micros(col("time")) - pmod(unix_micros(col("time")), lit(us))))
  }

  /** Write LTSS rows as a time-chunked, entity-sorted parquet layout. */
  def writeParquet(ltss: DataFrame, path: String, cfg: LtssConfig = LtssConfig()): Unit =
    ltss
      .withColumn("chunk", chunkCol(cfg))
      .repartition(col("chunk"))
      .sortWithinPartitions(col("entity_id"), col("time"))
      .write
      .mode(SaveMode.Append)
      .partitionBy("chunk")
      .parquet(path)

  /** JDBC append with the reference's retry envelope (≤10 tries, 3 s —
    * __init__.py:53,201-244). Transient failures retry the whole batch
    * (at-least-once, matching checkpointed streaming semantics); after
    * maxRetries the batch is dropped with a log, like the reference's
    * give-up-and-drop path. */
  def writeJdbc(
      ltss: DataFrame,
      cfg: LtssConfig,
      table: String = "ltss",
      maxRetries: Int = 10,
      retryWaitMs: Long = 3000L,
      sleep: Long => Unit = Thread.sleep): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        ltss.write
          .mode(SaveMode.Append)
          .option("batchsize", 1000)
          .jdbc(cfg.dbUrl, table, new java.util.Properties())
        done = true
      } catch {
        case e: java.sql.SQLTransientException if attempt < maxRetries =>
          attempt += 1; sleep(retryWaitMs)
        case e: java.sql.SQLException if attempt < maxRetries && isTransient(e) =>
          attempt += 1; sleep(retryWaitMs)
        case e: Exception =>
          // non-transient (or retries exhausted): log + drop, as the
          // reference does for SQLAlchemyError (__init__.py:229-235)
          System.err.println(s"[ltss-sink] dropping batch after $attempt retries: ${e.getMessage}")
          done = true
      }
    }
  }

  /** Connection-level failures the reference treats as OperationalError. */
  private def isTransient(e: java.sql.SQLException): Boolean = {
    val s = Option(e.getSQLState).getOrElse("")
    s.startsWith("08") || s.startsWith("53") || s == "57P03"
  }
}
