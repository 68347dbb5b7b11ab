package graft

/** Print plan-shape stats (exchanges, cartesians, codegen spans) for the
  * named queries: runMain graft.PlanAudit <sfDir> <query> [query ...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // flags (-v) are not query names — SparkEntry.queries("-v") would throw
    val (sfDir, names) = (args(0), args.drop(1).toSeq.filterNot(_.startsWith("-")))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      println(s"PLAN $n exchanges=${p.linesIterator.count(_.contains("Exchange"))}" +
        s" cartesian=${p.linesIterator.count(_.contains("Cartesian"))}" +
        s" wholestage=${p.linesIterator.count(_.contains("WholeStageCodegen"))}")
      if (args.contains("-v")) println(p)
    }
    spark.stop()
  }
}
