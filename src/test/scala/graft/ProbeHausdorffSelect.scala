package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 probe: does the selection threshold actually prune? Reports the
  * admitted-pair count, the certified threshold t2, the survivor count
  * and the per-phase times of the new selection-aware plan. */
object ProbeHausdorffSelect {
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
    val dirAdm = starts.join(bCells, Seq("chunk", "jla", "jlo"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dmin2", expr("aggregate(bpts, cast(1e308 as double), " +
        "(acc, p) -> least(acc, " +
        "(alat1 - p.blat) * (alat1 - p.blat) " +
        "+ (alon1 - p.blon) * (alon1 - p.blon)))"))
      .filter(col("dmin2") <= lit(D2))
      .select(col("chunk"),
        least(col("id_a"), col("id_b")).as("id_lo"),
        greatest(col("id_a"), col("id_b")).as("id_hi"),
        (col("id_a") < col("id_b")).as("fwd"),
        col("dmin2"))
      .groupBy(col("chunk"), col("id_lo"), col("id_hi"), col("fwd"))
      .agg(min(col("dmin2")).as("ddir"))
    val cand = t("screen->cand checkpoint")(
      dirAdm.groupBy(col("chunk"), col("id_lo"), col("id_hi"))
        .agg(count(lit(1)).as("ndir"), max(col("ddir")).as("lb2"))
        .filter(col("ndir") === 2)
        .select(col("chunk"), col("id_lo").as("id_a"),
          col("id_hi").as("id_b"), col("lb2"))
        .localCheckpoint(true))
    println(s"  cand=${t("cand count")(cand.count())}")
    val lbq = cand.select(
      min(col("lb2")), expr("percentile(lb2, 0.5)"),
      expr("percentile(lb2, 0.05)"), max(col("lb2"))).head()
    println(s"  lb2 min=${lbq.get(0)} p05=${lbq.get(2)} p50=${lbq.get(1)} max=${lbq.get(3)}")
    // seed DP: exact H on 64 best-bounded pairs
    val tracks = segs.select(col("id"), col("chunk"),
      size(col("seg")).cast("long").as("n"),
      array_distinct(arrays_zip(
        col("seg.lat").as("lat"), col("seg.lon").as("lon"))).as("pts"))
    import spark.implicits._
    def exactH(pairs: org.apache.spark.sql.DataFrame) = {
      val withA = tracks
        .select(col("id").as("id_a"), col("chunk"),
          col("n").as("na"), col("pts").as("pa"))
        .join(pairs, Seq("id_a", "chunk"))
      val withB = tracks
        .select(col("id").as("id_b"), col("chunk"),
          col("n").as("nb"), col("pts").as("pb"))
        .join(withA, Seq("id_b", "chunk"))
      withB.select(col("chunk").as("month"), col("id_a"), col("id_b"),
          col("pa.lat").as("ala"), col("pa.lon").as("alo"),
          col("pb.lat").as("bla"), col("pb.lon").as("blo"))
        .as[(java.sql.Timestamp, Long, Long,
          Array[Double], Array[Double], Array[Double], Array[Double])]
        .map { case (m, a, b, ala, alo, bla, blo) =>
          val hab = graft.operators.Queries.directedHausdorff2Arrays(ala, alo, bla, blo)
          val hba = graft.operators.Queries.directedHausdorff2Arrays(bla, blo, ala, alo)
          (m, a, b, math.max(hab, hba))
        }
        .toDF("month", "id_a", "id_b", "h2")
    }
    val seed = cand
      .orderBy(col("lb2"), col("id_a"), col("id_b"), col("chunk"))
      .limit(64)
      .select(col("chunk"), col("id_a"), col("id_b"))
    val seedH = t("seed DP")(
      exactH(seed).select(col("h2")).orderBy(col("h2")).limit(20)
        .agg(when(count(col("h2")) >= 20, max(col("h2")))
          .otherwise(lit(Double.MaxValue)).as("t2")).head().getDouble(0))
    println(s"  t2=$seedH")
    val nSurv = t("survivor count")(
      cand.filter(col("lb2") <= lit(seedH)).count())
    println(s"  survivors=$nSurv of ${cand.count()}")
    t("FULL query")(
      SparkEntry.queries("ltss_geo_hausdorff")(spark, sfDir).count())
    spark.stop()
  }
}
