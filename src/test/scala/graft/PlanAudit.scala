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
      // -e: execute THIS dataframe's own plan (collect, not count —
      // count builds a different QueryExecution) so AQE finalizes it;
      // exchange counts then reflect runtime reuse (ReusedExchange)
      // and codegen spans appear
      if (args.contains("-e")) df.collect()
      val p = df.queryExecution.executedPlan.toString
      // codegen'd operators print with a "*(stageId)" prefix in the plan
      // string; distinct stage ids = whole-stage codegen span count
      val spans = p.linesIterator
        .flatMap("""\*\((\d+)\)""".r.findAllMatchIn(_).map(_.group(1))).toSet
      // "Exchange " alone also matches "ReusedExchange " — exclude it so
      // the exchanges/reused split doesn't double-count reuse
      println(s"PLAN $n exchanges=${p.linesIterator.count(l => l.contains("Exchange ") && !l.contains("ReusedExchange"))}" +
        s" reused=${p.linesIterator.count(_.contains("ReusedExchange"))}" +
        s" cartesian=${p.linesIterator.count(_.contains("Cartesian"))}" +
        s" wholestage=${spans.size}")
      if (args.contains("-v")) println(p)
    }
    spark.stop()
  }
}
