package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 probe: the exposure ROUTE input at a folded scale — the
  * contact-pair edge count, unfiltered and practice-filtered, against
  * the 4 M-edge local cap. Decides (and documents) which route the
  * folded rows in SCALING.md actually measured. */
object ProbeEdgeCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.install(spark)
    val t0 = System.nanoTime()
    graft.operators.Queries.contactPairHourFrame(spark, sfDir).count()
    val pairs = graft.operators.Queries.contactPairFrame(spark, sfDir)
    val n = pairs.count()
    val nf = pairs.filter(col("n_contacts") >= 2L && col("min_d2") <= 32.0).count()
    println(f"EDGES sf=$sfDir unfiltered=$n%d filtered=$nf%d " +
      f"warm=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
