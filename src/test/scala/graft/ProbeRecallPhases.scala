package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 measurement probe: the recall_truth warm build (9.1 s in the
  * r20 bench) is the inverted count join over the md5 half-sample's
  * shingles; after the r21 allpairs rework (checkpointed prefix +
  * sorted-merge verify) the REGIME tradeoff may have flipped — time
  * both exact-pair siblings on the identical input and the full
  * recall frame build. */
object ProbeRecallPhases {
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
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    t("warm bands")(graft.operators.Dedup.warmShared(spark, sfDir))
    val sh = t("half-sample shingles build") {
      val f = graft.operators.Dedup.sampleShingleFrame(spark, sfDir, "8")
      f.count(); f
    }
    val iv = t("invertedCountPairs (count)")(
      graft.operators.Dedup.invertedCountPairs(sh, 1, 2).count())
    val ex = t("exactJaccardPairs (count)")(
      graft.operators.Dedup.exactJaccardPairs(sh, 1, 2).count())
    println(s"  inverted=$iv prefix=$ex")
    t("recall_truth full (cold)")(
      graft.operators.Dedup.warmRecallTruth(spark, sfDir))
    spark.stop()
  }
}
