package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}
import graft.functions.DetMath

/** Pins the product-quantization properties the oracle row cannot see:
  * complete/bounded codes, the Cauchy–Schwarz bound on the ADC score
  * (adc_cosine IS cos(query, reconstruction)), and an index-quality
  * floor — ADC's top picks must rank above the corpus average by TRUE
  * cosine, i.e. the compressed scan carries real signal. */
class PqSpec extends SparkSpec {

  private val D = "/root/testdata/sf0.001"

  test("codebook geometry scales with the corpus: fixture below the line, production at bench SF") {
    assert(Pq.params(spark, D) == Pq.FixtureParams)
    assert(Pq.params(spark, "/root/testdata/sf0.01") == Pq.FixtureParams)
    assert(Pq.params(spark, "/root/testdata/sf0.1") == Pq.ProdParams)
  }

  test("every vector gets one code per subspace, within the codebook") {
    val n = Tables.embeddings(spark, D).count()
    val codes = Pq.pqCodes(spark, D)
    assert(codes.count() == n)
    val bad = codes.filter(
      col("c0") < 0 || col("c0") >= Pq.PqK || col("c1") < 0 || col("c1") >= Pq.PqK)
    assert(bad.count() == 0)
  }

  test("adc_cosine is a true cosine of the reconstruction: |score| <= 1") {
    val out = Pq.pqTopkQ.run(spark, D).collect()
    assert(out.length == 10)
    assert(out.forall(r => math.abs(r.getAs[Double]("adc_cosine")) <= 1.0))
  }

  test("recall ordering: exact rerank never degrades its candidate stage") {
    val r = Pq.recallReportQ.run(spark, D).collect()
      .map(x => x.getAs[String]("method") -> x.getAs[Long]("hits")).toMap
    assert(r("ivfpq_rerank") >= r("ivfpq"),
      s"reranking ivfpq candidates lost recall: $r")
    assert(r("pq_rerank") >= r("pq_adc"),
      s"reranking adc candidates lost recall: $r")
    assert(r("ivf_probe") > 0, s"trained probe found nothing: $r")
    assert(r("binary_rerank") > 0,
      s"binary-sign candidates + exact rerank found nothing: $r")
  }

  test("ADC top-10 beats the corpus average by TRUE cosine to the query") {
    val emb = Tables.embeddings(spark, D)
      .withColumn("nrm", DetMath.normCol(col("embedding"), Similarity.Dim))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("nrm").as("qn"))
    val exact = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), DetMath.cosinePre(
        DetMath.dotCol(col("embedding"), col("qe"), Similarity.Dim),
        col("nrm"), col("qn")).as("cos"))
    val byId = exact.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val corpusMean = byId.values.sum / byId.size
    val picks = Pq.pqTopkQ.run(spark, D).collect().map(_.getAs[Long]("vec_id"))
    val pickMean = picks.map(byId).sum / picks.length
    assert(pickMean > corpusMean,
      s"ADC picks (true-cos mean $pickMean) must beat corpus mean $corpusMean")
  }

  test("geometry-dependent oracle list stays in sync with the registered oracle SQL") {
    // every listed name must be a registered oracle (a rename would
    // silently stop the Verify-side omission) and its SQL must be the
    // fixture shape the omission exists for (c0/c1 columns)
    val listed = Pq.GeometryDependentOracles ++ Similarity.GeometryDependentOracles
    // listed for a different invalid-at-scale reason: the Spark side
    // SAMPLES above CalibSampleCap, so the unsampled oracle SQL stops
    // describing the plan — registered, but not Lloyd/PQ fixture-shaped
    val sampleDependent = Set("dedup_embedding_calibration")
    for (name <- listed) {
      val sql = SparkEntry.oracleSql.get(name)
      assert(sql.nonEmpty, s"$name not in SparkEntry.oracleSql")
      if (!sampleDependent(name))
        assert(sql.get.contains("c0"), s"$name oracle no longer fixture-shaped")
    }
    // the sample cap must not undercut the fixture threshold, or a gate
    // corpus could sample (stride > 1) while its oracle still runs
    assert(Similarity.CalibSampleCap >= Similarity.ProdMinVectors)
    // reverse direction: every REGISTERED oracle whose SQL embeds the
    // fixture chains (the seed-centroid CTE "c0 AS (" of the Lloyd
    // replay, or PQ's c0/c1 code columns via "AS c0") must be listed —
    // an unlisted fixture-shaped oracle is exactly the false-mismatch
    // sim_knn_recall shipped with in r8
    val fixtureShaped = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("c0 AS (") || sql.contains("AS c0") => name
    }.toSet
    assert(fixtureShaped.subsetOf(listed),
      s"fixture-shaped oracle SQL not in GeometryDependentOracles: ${fixtureShaped -- listed}")
    // the gate fixtures are below ProdMinVectors: the SQL stays valid there
    assert(Pq.fixtureOracleValid(spark, D) && Similarity.fixtureOracleValid(spark, D),
      "sf0.001 fixture must train the DuckDB-replayable geometry")
  }
}
