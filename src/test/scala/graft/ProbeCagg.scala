package graft

/** Scratch diagnostic for the r11 `cagg_layout` warm-build anomaly:
  * times each warm build in the bench's order so the 21.5 s can be
  * attributed to the build itself or to accumulated session state. */
object ProbeCagg {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    graft.plans.GraftExtensions.install(spark)
    def tm(name: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime()
      b
      println(f"WARM $name t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val mode = args.headOption.getOrElse("full")
    if (mode == "alone") {
      tm("cagg_layout")(graft.operators.TimeSeries.caggLayoutPath(spark, sfDir))
    } else {
      tm("dedup_bands")(graft.operators.Dedup.warmShared(spark, sfDir))
      tm("recall_truth")(graft.operators.Dedup.warmRecallTruth(spark, sfDir))
      tm("cc_labels")(graft.operators.Dedup.ccLabels(spark, sfDir).count())
      tm("ltss_layout")(graft.operators.Queries.ltssLayoutPath(spark, sfDir))
      tm("zorder_layout")(graft.operators.Queries.zorderLayoutPath(spark, sfDir))
      tm("ltss_attr_layout")(graft.operators.Queries.ltssAttrLayoutPath(spark, sfDir))
      tm("geo_layout")(graft.operators.Queries.geoLayoutPath(spark, sfDir))
      tm("kmeans_train")(graft.operators.Similarity.kmeansAssignments(spark, sfDir,
        graft.operators.Similarity.KmIters).count())
      tm("ivf_layout")(graft.operators.Similarity.ivfLayoutPath(spark, sfDir))
      tm("pq_train")(graft.operators.Pq.pqCodes(spark, sfDir).count())
      tm("ivfpq_layout")(graft.operators.Pq.ivfPqLayoutPath(spark, sfDir))
      tm("cagg_layout")(graft.operators.TimeSeries.caggLayoutPath(spark, sfDir))
      tm("inv_index")(graft.operators.TextOps.invIndexPath(spark, sfDir))
    }
    spark.stop()
  }
}
