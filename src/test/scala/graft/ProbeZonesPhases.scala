package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r21 measurement probe: phase breakdown of `ltss_zones_dwell`
  * (2.2 s driver / ~3 s warm at sf0.1) — times the full-fix window
  * pass, the bbox-pruned ray-cast join, and the visit window + rollup
  * separately so the optimization targets the measured cost center. */
object ProbeZonesPhases {
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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warm zone layout")(
      graft.operators.Queries.zoneLayoutPath(spark, sfDir))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def fixes = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      .withColumn("lat", (col("user_id") % 180 - 90).cast("double") + 0.5)
      .withColumn("lon", (col("event_id") % 360 - 180).cast("double") + 0.5)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("held_us",
        coalesce(unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")),
          lit(0L)))
      .select(col("user_id"), col("ts"), col("rn"), col("held_us"),
        col("lat"), col("lon"))
    t("fixes window (noop)")(noop(fixes))
    val zones = broadcast(spark.read.parquet(
      graft.operators.Queries.zoneLayoutPath(spark, sfDir)))
    val nxt = concat(expr("slice(verts, 2, size(verts) - 1)"),
      expr("slice(verts, 1, 1)"))
    val crossings = aggregate(
      zip_with(col("verts"), nxt, (a, b) =>
        when((a("y") > col("lat")) =!= (b("y") > col("lat")),
          when(col("lon") < (b("x") - a("x")) * (col("lat") - a("y")) /
            (b("y") - a("y")) + a("x"), 1).otherwise(0)).otherwise(0)),
      lit(0), (acc, x) => acc + x)
    def inside = fixes.join(zones,
        col("lat") >= col("lat_min") && col("lat") <= col("lat_max") &&
          col("lon") >= col("lon_min") && col("lon") <= col("lon_max"))
      .withColumn("crossings", crossings)
      .filter(col("crossings") % 2 === 1)
    val nBbox = t("bbox candidates count")(fixes.join(zones,
      col("lat") >= col("lat_min") && col("lat") <= col("lat_max") &&
        col("lon") >= col("lon_min") && col("lon") <= col("lon_max")).count())
    println(s"  bbox candidate rows=$nBbox")
    t("inside join+raycast (noop)")(noop(inside))
    t("full query 1")(SparkEntry.queries("ltss_zones_dwell")(spark, sfDir).count())
    t("full query 2")(SparkEntry.queries("ltss_zones_dwell")(spark, sfDir).count())
    spark.stop()
  }
}
