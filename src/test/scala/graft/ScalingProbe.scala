package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The r8 scaling probe (VERDICT r7 #1): build a ~10× key-shifted copy
  * of the sf0.1 tables under scratch (NEVER touching /root/testdata),
  * run the heaviest queries at both scales with the Bench protocol, and
  * record per-query time ratios in SCALING.md. The probe converts the
  * "designed for 100 TB" argument into measured scaling exponents.
  *
  * Key-shifting is designed so the WORKLOAD scales linearly instead of
  * degenerating into cross-copy duplication (which would measure a
  * quadratic pair explosion the real corpus doesn't have):
  *  - events: event_id/user_id shift per copy → 10× entities, each with
  *    the original series length and time span;
  *  - documents: doc_id shift + a per-copy Caesar rotation of the text
  *    (bijective per copy, so intra-copy near-dup structure is EXACTLY
  *    preserved while cross-copy shingles/fingerprints never collide);
  *  - embeddings: vec_id shift + a per-copy circular rotation of the
  *    vector dims (norm-preserving, so intra-copy cosine structure is
  *    exact while cross-copy cosines are uncorrelated). Copy 0 is the
  *    original bytes, keeping the fixed query vectors (vec_id < 5). */
object ScalingData {
  val DefaultDir: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scaling_sf1"

  private def caesar(c: Column, k: Int): Column = {
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val up = lo.toUpperCase
    val r = k % 26
    if (r == 0) c
    else translate(c, lo + up,
      lo.drop(r) + lo.take(r) + up.drop(r) + up.take(r))
  }

  private def rotate(c: Column, k: Int, dim: Int): Column = {
    val r = k % dim
    if (r == 0) c
    else concat(slice(c, r + 1, dim - r), slice(c, 1, r))
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    val done = new java.io.File(s"$out/_GRAFT_SCALING_DONE")
    if (done.exists()) { println(s"[scaling] $out already generated"); return }

    val events = spark.read.parquet(s"$src/events.parquet")
    val eOff = events.agg(max(col("event_id"))).head().getLong(0) + 1L
    val uOff = events.agg(max(col("user_id"))).head().getLong(0) + 1L
    (0 until copies).map { c =>
      events.select(
        (col("event_id") + lit(c * eOff)).as("event_id"), col("ts"),
        (col("user_id") + lit(c * uOff)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dOff = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + lit(c * dOff)).as("doc_id"),
        caesar(col("text"), c).as("text"),
        col("lang"), col("source"),
        col("n_chars"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vOff = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    val dim = graft.operators.Similarity.Dim
    (0 until copies).map { c =>
      emb.select(
        (col("vec_id") + lit(c * vOff)).as("vec_id"),
        rotate(col("embedding"), c, dim).cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ union _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    done.getParentFile.mkdirs()
    java.nio.file.Files.writeString(done.toPath, s"src=$src copies=$copies\n")
    println(s"[scaling] generated $out (${copies}x $src)")
  }
}

object ScalingGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else ScalingData.DefaultDir
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScalingData.generate(spark, src, out, copies)
    spark.stop()
  }
}

/** Bench-protocol timing of a NAMED subset of queries on one dataset:
  * session + artifact warm-up first (reported separately as warm_build,
  * exactly like Bench), then 3 interleaved passes with per-query
  * medians. One JSON line to stdout and to the given output file. */
object ScalingProbe {
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val names = args.drop(2).toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    graft.plans.GraftExtensions.install(spark)
    val warmBuilds = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def warmed(name: String)(build: => Unit): Unit = {
      val t0 = System.nanoTime()
      build
      warmBuilds(name) = (System.nanoTime() - t0) / 1e9
    }
    warmed("dedup_bands")(graft.operators.Dedup.warmShared(spark, sfDir))
    warmed("kmeans_train")(
      graft.operators.Similarity.kmeansAssignments(spark, sfDir,
        graft.operators.Similarity.KmIters).count())
    warmed("pq_train")(graft.operators.Pq.pqCodes(spark, sfDir).count())
    warmed("pipeline_stage")(
      graft.operators.Pipeline.stageFrame(spark, sfDir).count())
    locally {
      import spark.implicits._
      val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try graft.operators.Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))._1.count()
      finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      ()
    }
    val Runs = 3
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val errs = scala.collection.mutable.Map.empty[String, String]
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadAvgs = scala.collection.mutable.ListBuffer(osBean.getSystemLoadAverage)
    for (_ <- 1 to Runs) {
      for (name <- names if !errs.contains(name)) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch {
          case e: Throwable =>
            errs(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").replace('\n', ' ').take(160)
        }
        times(name) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(name, Nil)
      }
      loadAvgs += osBean.getSystemLoadAverage
    }
    // errored queries report only under "errors" — a failure-run wall time
    // in the medians map would read as a measured median
    val medians = names.filterNot(errs.contains).map { n =>
      val ts = times(n)
      n -> ts.sorted.apply(ts.size / 2)
    }
    val qs = medians.map { case (k, v) => q(k) + ":" + v }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => q(k) + ":" + q(v) }.mkString("{", ",", "}")
    val warm = warmBuilds.map { case (k, v) => q(k) + ":" + v }.mkString("{", ",", "}")
    val line = s"""{"sf":${q(sfDir)},"queries":$qs,"errors":$es,""" +
      s""""warm_build":$warm,"runs_per_query":$Runs,"aggregation":"median",""" +
      s""""load_avg":${loadAvgs.mkString("[", ",", "]")}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
