package graft

import org.apache.spark.sql.SparkSession

/** r21 measurement probe: phase breakdown of the PQ warm builds —
  * pq_train (16.9 s in the r20 bench warm section) and ivfpq_layout
  * (12.2 s) — separating the 8 sub-codebook trainings, the corpus
  * encode, and the partitioned layout write so the §2.6 overlap work
  * targets the measured cost, not the assumed one. */
object ProbePqPhases {
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
    t("kmeans_train")(graft.operators.Similarity.kmeansAssignments(
      spark, sfDir, graft.operators.Similarity.KmIters).count())
    val P = graft.operators.Pq.params(spark, sfDir)
    // the bench's warmed("pq_train") shape: trains every sub-codebook
    // (concurrently since r21) and encodes the corpus
    t("pq_train (pqCodes cold)")(graft.operators.Pq.pqCodes(spark, sfDir).count())
    for (m <- 0 until P.m)
      t(s"pq centroids m=$m (cached)")(
        graft.operators.Pq.pqCentroids(spark, sfDir, m).count())
    t("ivfpq layout write")(graft.operators.Pq.ivfPqLayoutPath(spark, sfDir))
    spark.stop()
  }
}
