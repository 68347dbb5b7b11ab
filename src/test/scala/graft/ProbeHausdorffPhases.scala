package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 measurement probe: phase breakdown of `ltss_geo_hausdorff`
  * (the most expensive query after the exposure fix, ~10 s at sf0.1) —
  * times the screen stages and the admitted-pair DP separately so any
  * rewrite targets the measured cost center, not the audited-and-
  * rejected ones (SCALING.md r17/r18: in-join evaluation and the
  * min/max-box pre-gate were probed and rejected with measurements). */
object ProbeHausdorffPhases {
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
      println(f"PHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    t("warm track2d_layout")(
      graft.operators.Queries.trackLayout2dPath(spark, sfDir))
    val D = 20.0
    val D2 = D * D
    val segs = spark.read.parquet(
        graft.operators.Queries.trackLayout2dPath(spark, sfDir))
      .select(col("id"), col("chunk"), col("seg"))
    println(s"  segs=${t("segs count")(segs.count())}")
    val starts = segs.select(col("id").as("id_a"), col("chunk"),
        element_at(col("seg"), 1).as("p1"))
      .select(col("id_a"), col("chunk"),
        col("p1.lat").as("alat1"), col("p1.lon").as("alon1"))
      .withColumn("cla", floor((col("alat1") + lit(90.0)) / lit(D)).cast("long"))
      .withColumn("clo", floor((col("alon1") + lit(180.0)) / lit(D)).cast("long"))
      .withColumn("dla", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dlo", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("chunk"), col("id_a"), col("alat1"), col("alon1"),
        (col("cla") + col("dla")).as("jla"), (col("clo") + col("dlo")).as("jlo"))
    val bCells = segs.select(col("id").as("id_b"), col("chunk"),
        explode(col("seg")).as("f"))
      .select(col("id_b"), col("chunk"),
        col("f.lat").as("blat"), col("f.lon").as("blon"))
      .distinct()
      .withColumn("jla", floor((col("blat") + lit(90.0)) / lit(D)).cast("long"))
      .withColumn("jlo", floor((col("blon") + lit(180.0)) / lit(D)).cast("long"))
      .groupBy(col("id_b"), col("chunk"), col("jla"), col("jlo"))
      .agg(collect_list(struct(col("blat"), col("blon"))).as("bpts"))
    val bCellsC = bCells.localCheckpoint(true)
    println(s"  bcells=${t("bcells build+count")(bCellsC.count())}")
    val joined = starts.join(bCellsC, Seq("chunk", "jla", "jlo"))
      .filter(col("id_a") =!= col("id_b"))
    println(s"  joined=${t("grid join count")(joined.count())}")
    val dirAdm = joined
      .filter(expr(s"exists(bpts, p -> " +
        s"(alat1 - p.blat) * (alat1 - p.blat) " +
        s"+ (alon1 - p.blon) * (alon1 - p.blon) <= $D2)"))
      .select(col("chunk"),
        least(col("id_a"), col("id_b")).as("id_lo"),
        greatest(col("id_a"), col("id_b")).as("id_hi"),
        (col("id_a") < col("id_b")).as("fwd"))
      .distinct()
    val dirAdmC = dirAdm.localCheckpoint(true)
    println(s"  diradm=${t("exists screen count")(dirAdmC.count())}")
    val cand = dirAdmC.groupBy(col("chunk"), col("id_lo"), col("id_hi"))
      .agg(count(lit(1)).as("ndir"))
      .filter(col("ndir") === 2)
    println(s"  cand=${t("cand rollup")(cand.count())}")
    t("FULL query (bench shape)")(
      SparkEntry.queries("ltss_geo_hausdorff")(spark, sfDir).count())
    // admitted-pair work profile: segment lengths of survivors
    val prof = cand.select(col("id_lo").as("id"), col("chunk"))
      .union(cand.select(col("id_hi"), col("chunk")))
      .join(segs.select(col("id"), col("chunk"), size(col("seg")).as("n")),
        Seq("id", "chunk"))
      .agg(count(lit(1)), avg(col("n")), max(col("n"))).head()
    println(s"  survivors=${prof.getLong(0)} avg_n=${prof.getDouble(1)} max_n=${prof.getInt(2)}")
    spark.stop()
  }
}
