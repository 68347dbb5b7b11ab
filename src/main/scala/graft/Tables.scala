package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md). */
object Tables {

  /** Fixture timestamp columns arrive in whatever physical form the
    * fixture writer chose — µs with no timezone annotation reads as
    * TIMESTAMP_NTZ, which time functions (`unix_micros`) reject at
    * analysis time. Normalize every timestamp column to TimestampType on
    * read: the session TZ is pinned to UTC, so the cast is
    * value-preserving, and operators never see a type that depends on
    * which writer produced the parquet (the round-9 fixture regeneration
    * flipped events.ts under the suite exactly this way). */
  private def normTs(df: DataFrame): DataFrame = {
    val ntz = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[TimestampNTZType] => f.name
    }
    ntz.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Local-mode parallelism fix for compute-heavy scans: the test tables
    * are single small parquet files, so Spark plans ONE scan task and a
    * per-row-expensive pipeline (minhash, JSON parse) runs on one core.
    * On a real cluster file splits/many files provide this parallelism,
    * so the repartition is GATED: it only fires when the scan plans
    * fewer partitions than the session's parallelism. At 100 TB the scan
    * has thousands of splits and this is a no-op — no shuffle of the
    * fact table in front of a map-only stage. */
  def fanOut(df: DataFrame): DataFrame = {
    // a streaming frame has no .rdd (that would execute it as a batch)
    // and gets its parallelism from the source's own partitioning
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parallelism = math.min(target, spark.sparkContext.defaultParallelism)
    if (df.rdd.getNumPartitions >= parallelism) df
    else df.repartition(target)
  }

  /** events.ts additionally handles the nanosecond-int64 form (Spark 4
    * refuses ns as TimestampType; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong` and this loader truncates
    * ns → µs, matching DuckDB's ns→µs cast, SURVEY.md §7.4); the NTZ
    * form is already normalized by [[table]]. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
