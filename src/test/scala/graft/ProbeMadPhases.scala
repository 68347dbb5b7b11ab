package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 measurement probe: phase breakdown of `ltss_anomaly_mad` (r20
  * VERDICT next-round item 5 — 2.1–3.2 s driver, attributed by the r20
  * builder to "cached histogram first touch + two windows" without a
  * probe). Times the histogram build, its warm re-read, and the
  * downstream median/MAD machinery separately so the optimization (if
  * any) targets the measured cost center. */
object ProbeMadPhases {
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
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/events.parquet").count()
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val q = SparkEntry.queries("ltss_anomaly_mad")
    // cold: builds + persists the (domain, sv) histogram, then runs the
    // median/MAD windows over it
    t("query cold (builds counts)")(q(spark, sfDir).count())
    // warm: the histogram is persisted — this is the bench's steady state
    t("query warm 1")(q(spark, sfDir).count())
    t("query warm 2")(q(spark, sfDir).count())
    // the histogram alone, warm (persisted read)
    val counts = graft.CachedFrames.getOrBuild(
      s"mad_counts|${graft.CachedFrames.sessionKey(spark)}|$sfDir") {
      graft.operators.Queries.ltss(spark, sfDir)
        .withColumn("domain", split(col("entity_id"), "\\.").getItem(0))
        .withColumn("sv", expr("try_cast(state as decimal(12,2))"))
        .groupBy(col("domain"), col("sv")).agg(count(lit(1)).as("cnt"))
    }
    val n = t("counts warm count")(counts.count())
    println(s"  histogram rows=$n")
    spark.stop()
  }
}
