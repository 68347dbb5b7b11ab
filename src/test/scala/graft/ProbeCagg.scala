package graft

/** Scratch diagnostic for the migrating warm-build anomaly (r11:
  * `cagg_layout` 21.5 s; r12: `kmeans_train` 21.7 s, `ltss_attr_layout`
  * 14.6 s — different builds each round, no code change to their plans):
  * times each warm build in the bench's order, printing per-build JVM
  * JIT-compilation and GC time deltas alongside wall time, so a slow
  * build can be attributed to its own work vs accumulated session state
  * (Janino/codegen compilation storms, code-cache pressure, GC).
  *
  *   Test/runMain graft.ProbeCagg full            # bench warm order
  *   Test/runMain graft.ProbeCagg kmeans_train    # one build, cold JVM
  */
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

    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def tm(name: String)(b: => Unit): Unit = {
      val (j0, g0, t0) = (jitBean.getTotalCompilationTime, gcMs, System.nanoTime())
      b
      val w = (System.nanoTime() - t0) / 1e9
      println(f"WARM $name t=$w%.2f s jit=${jitBean.getTotalCompilationTime - j0}%d ms " +
        f"gc=${gcMs - g0}%d ms")
    }
    // the bench's exact warm sequence (Bench.scala keeps the canonical copy)
    val builds: Seq[(String, () => Unit)] = Seq(
      "dedup_bands" -> (() => graft.operators.Dedup.warmShared(spark, sfDir)),
      "recall_truth" -> (() => graft.operators.Dedup.warmRecallTruth(spark, sfDir)),
      "cc_labels" -> (() => { graft.operators.Dedup.ccLabels(spark, sfDir).count(); () }),
      "ltss_layout" -> (() => { graft.operators.Queries.ltssLayoutPath(spark, sfDir); () }),
      "zorder_layout" -> (() => { graft.operators.Queries.zorderLayoutPath(spark, sfDir); () }),
      "ltss_attr_layout" -> (() => { graft.operators.Queries.ltssAttrLayoutPath(spark, sfDir); () }),
      "geo_layout" -> (() => { graft.operators.Queries.geoLayoutPath(spark, sfDir); () }),
      "kmeans_train" -> (() => { graft.operators.Similarity.kmeansAssignments(spark, sfDir,
        graft.operators.Similarity.KmIters).count(); () }),
      "ivf_layout" -> (() => { graft.operators.Similarity.ivfLayoutPath(spark, sfDir); () }),
      "pq_train" -> (() => { graft.operators.Pq.pqCodes(spark, sfDir).count(); () }),
      "ivfpq_layout" -> (() => { graft.operators.Pq.ivfPqLayoutPath(spark, sfDir); () }),
      "cagg_layout" -> (() => { graft.operators.TimeSeries.caggLayoutPath(spark, sfDir); () }),
      "dense_dev" -> (() => { graft.operators.TimeSeries.denseDevCached(spark, sfDir).count(); () }),
      "inv_index" -> (() => { graft.operators.TextOps.invIndexPath(spark, sfDir); () }),
      "shingle_pairs" -> (() => { graft.operators.TextOps.shinglePairs(spark, sfDir).count(); () }),
      "pipeline_stage" -> (() => { graft.operators.Pipeline.stageFrame(spark, sfDir).count(); () }))
    val picked = args.toSeq match {
      case Seq() | Seq("full") => builds
      case Seq("alone") => builds.filter(_._1 == "cagg_layout") // legacy alias
      case names => builds.filter(b => names.contains(b._1))
    }
    picked.foreach { case (n, b) => tm(n)(b()) }
    spark.stop()
  }
}
