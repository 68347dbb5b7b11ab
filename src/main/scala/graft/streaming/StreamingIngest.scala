package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.config.LtssConfig
import graft.operators.Transform
import graft.sources.LtssSink

/** The streaming ingest pipeline (SURVEY.md §2.1/§3):
  * source → validity filter (S2) → entity filter (F2) → projection
  * (P1–P4) → sink (K1/K2), as Structured Streaming.
  *
  * Differences from the reference are deliberate upgrades
  * (SURVEY.md §1.3): the unbounded in-memory `queue.Queue` becomes
  * checkpointed micro-batches (at-least-once instead of at-most-once);
  * the one-row-per-transaction insert loop becomes per-batch batched
  * writes; graceful shutdown (`None` sentinel → drain → dispose,
  * __init__.py:164-199) becomes `processAllAvailable()` + `stop()`.
  */
object StreamingIngest {

  /** Streaming source of state events from a JSON directory (the test/
    * file guise of the reference's event-bus subscription, S1;
    * production guise would be Kafka with the same downstream plan). */
  def readJsonEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.schema.LtssSchema.eventSchema)
      .option("maxFilesPerTrigger", 16) // B1: the buffer knob
      .json(dir)

  /** events stream → LTSS rows stream (same Transform as batch — the
    * pipeline is declarative, so batch and streaming share one plan). */
  def toLtss(events: DataFrame, cfg: LtssConfig): DataFrame =
    Transform.eventsToLtss(events, cfg)

  /** Start the ingest: foreachBatch into the chunked parquet layout (or
    * JDBC when cfg.dbUrl is a jdbc: URL), checkpointed. */
  def start(
      events: DataFrame,
      cfg: LtssConfig,
      outPath: String,
      checkpoint: String): StreamingQuery =
    toLtss(events, cfg).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (cfg.dbUrl.startsWith("jdbc:")) LtssSink.writeJdbc(batch, cfg)
        else LtssSink.writeParquet(batch, outPath, cfg)
      }
      .start()

  /** Graceful shutdown: drain everything available, then stop — the
    * analog of the reference's sentinel + join (__init__.py:164-171). */
  def drainAndStop(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30000)
  }
}
