package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by the operator modules, each as an
  * [[graft.operators.OracleQuery]] (Spark impl + DuckDB oracle SQL).
  */
object SparkEntry {

  private val modules: Seq[OracleQuery] =
    Queries.all ++ TimeSeries.all ++ Relational.all ++ TextOps.all ++ Dedup.all ++
      Similarity.all ++ Pq.all ++ Multimodal.all ++ Sampling.all ++ Pipeline.all ++
      Retrieval.all

  /** Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.2): the
    * composite-index query — per-entity history slice with a
    * latest-state window over the LTSS mapping of `events`. */
  def entry(spark: SparkSession): DataFrame = {
    val ltss = Transform.eventsToLtss(
      Tables.events(spark, "/root/testdata/sf0.001"),
      graft.config.LtssConfig(enableLocation = false))
    val w = Window.partitionBy(col("entity_id")).orderBy(col("time").desc, col("state").desc)
    ltss
      .filter(col("time").between(lit("2024-01-01 00:00:00"), lit("2024-02-01 00:00:00")))
      .withColumn("rn", row_number().over(w))
      .withColumn("is_latest", (col("rn") === 1).cast("int"))
      .drop("rn")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.sql.map(q.name -> _)).toMap
}
