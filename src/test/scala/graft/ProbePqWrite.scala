package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 follow-up probe: the ivfpq layout write measured 19.5 s for a
  * ~2000-row partitioned parquet write (ProbePqPhases) — separate the
  * join compute from the write machinery to find the cost. */
object ProbePqWrite {
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
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    t("warm kmeans")(graft.operators.Similarity.kmeansAssignments(
      spark, sfDir, graft.operators.Similarity.KmIters).count())
    t("warm pq codes")(graft.operators.Pq.pqCodes(spark, sfDir).count())
    val asg = graft.operators.Similarity.kmeansAssignments(
      spark, sfDir, graft.operators.Similarity.KmIters)
      .select(col("vec_id"), col("cid"))
    val joined = graft.operators.Pq.pqCodes(spark, sfDir).join(asg, "vec_id")
    t("join count")(println("  rows=" + joined.count()))
    t("join noop")(joined.write.format("noop").mode("overwrite").save())
    t("flat parquet write")(joined.write.mode("overwrite")
      .parquet("/tmp/probe_pq_flat"))
    t("partitioned parquet write")(joined.write.mode("overwrite")
      .partitionBy("cid").parquet("/tmp/probe_pq_part"))
    t("coalesced part write")(joined.coalesce(1).write.mode("overwrite")
      .partitionBy("cid").parquet("/tmp/probe_pq_part2"))
    spark.stop()
  }
}
