package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumns.{columnOf, expressionOf}
import graft.functions.{MinShingleFp, SimHash16}

/** Native text-hash kernels vs the composed built-in expressions they
  * replace: the kernels must be bit-identical on every token-structure
  * edge case (the composed forms are the executable spec the DuckDB
  * oracles were written against). */
class KernelSpec extends SparkSpec {
  import spark.implicits._

  // adversarial token structures: empties from leading/trailing/double
  // spaces, single token, exactly-k tokens, unicode, long docs
  private val fixtures = Seq(
    "",
    " ",
    "  ",
    "one",
    "one two",
    "one two three four five",
    "one two three four five six seven",
    " leading space",
    "trailing space ",
    "double  space inside",
    "unicode tøkens æøå 漢字 emoji🙂 mixed",
    "a b a b a b a b a b a b a b",
    Seq.tabulate(300)(i => s"w${i % 17}").mkString(" "))

  /** The composed (pre-kernel) simhash expression — 16 interpreted
    * aggregate passes, one md5 per (token, bit). */
  private def composedSimhash(text: Column): Column = {
    val w = split(text, " ")
    val bits = (1 to 16).map { j =>
      val weight = (tok: Column) =>
        when(substring(md5(tok), j, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
          .otherwise(-1)
      val s0 = aggregate(w, lit(0), (acc, tok) => acc + weight(tok))
      when(s0 > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** The composed (pre-kernel) min-shingle fingerprint for k=5.
    * `try_element_at`, not `element_at`: under Spark 4's ANSI default an
    * out-of-range index THROWS, so the original composed query would
    * have failed on any <5-token doc — the DuckDB oracle's list indexing
    * yields NULL there (concat_ws skips it), which is what the kernel
    * and this spec implement. */
  private def composedMinShingle(text: Column): Column = {
    val w = split(text, " ")
    val shingles = transform(
      sequence(lit(1), greatest(size(w) - 4, lit(1))),
      i => concat_ws(" ", try_element_at(w, i), try_element_at(w, i + 1),
        try_element_at(w, i + 2), try_element_at(w, i + 3), try_element_at(w, i + 4)))
    array_min(transform(shingles, sh => md5(sh)))
  }

  test("simhash16 kernel is bit-identical to the composed aggregate form") {
    val df = fixtures.toDF("text").select(
      col("text"),
      columnOf(SimHash16(expressionOf(col("text")))).as("kernel"),
      composedSimhash(col("text")).as("composed"))
    val bad = df.filter(col("kernel") =!= col("composed")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
    // the kernel propagates null; the QUERY's coalesce restores the
    // composed/oracle behavior (CASE ... ELSE '0' → all-zero hash)
    val n = Seq[Option[String]](None).toDF("text").select(
      coalesce(columnOf(SimHash16(expressionOf(col("text")))), lit("0" * 16)).as("kernel"),
      composedSimhash(col("text")).as("composed")).head()
    assert(n.getString(0) == "0000000000000000" && n.getString(0) == n.getString(1))
  }

  test("min_shingle_fp kernel is bit-identical to the composed transform form") {
    val df = fixtures.toDF("text").select(
      col("text"),
      columnOf(MinShingleFp(expressionOf(col("text")), 5)).as("kernel"),
      composedMinShingle(col("text")).as("composed"))
    val bad = df.filter(col("kernel") =!= col("composed")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString("; ")}")
  }

  test("simhash and doc_fingerprint queries run the kernels — no interpreted HOF in the plan") {
    for (q <- Seq(graft.operators.TextOps.simhash, graft.operators.TextOps.fingerprint)) {
      val plan = q.run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      assert(!plan.contains("aggregate(") && !plan.contains("transform("),
        s"${q.name}: higher-order function leaked into the plan:\n$plan")
      assert(plan.contains("simhash16") || plan.contains("min_shingle_fp"),
        s"${q.name}: kernel missing from the plan:\n$plan")
    }
  }

  test("quality-signal queries run the stats kernels — no interpreted HOF in their plans") {
    val plans = Seq(
      graft.operators.TextOps.repetition.name ->
        graft.operators.TextOps.repetition.run(spark, "/root/testdata/sf0.001"),
      graft.operators.TextOps.qualityFilter.name ->
        graft.operators.TextOps.qualityFilter.run(spark, "/root/testdata/sf0.001"),
      graft.operators.TextOps.langId.name ->
        graft.operators.TextOps.langId.run(spark, "/root/testdata/sf0.001"),
      // the pipelines' quality scan lives in the shared stage frame's
      // BUILD plan (consumers read the persisted InMemoryRelation);
      // its passage gate legitimately carries the ONE chunking
      // transform lambda dedup_passage has always used, so only the
      // kernel-presence half applies to it
      "pipeline_stage_build" ->
        graft.operators.Pipeline.stageFrameBuild(spark, "/root/testdata/sf0.001"))
    for ((name, df) <- plans) {
      val plan = df.queryExecution.executedPlan.toString
      assert(name == "pipeline_stage_build" || !plan.contains("lambdafunction"),
        s"$name: interpreted lambda leaked into the plan:\n$plan")
      assert(plan.contains("gram2_stats") || plan.contains("token_set_count"),
        s"$name: stats kernel missing from the plan:\n$plan")
    }
  }

  test("kernels are reachable from spark.sql via GraftExtensions") {
    graft.plans.GraftExtensions.install(spark)
    fixtures.toDF("text").createOrReplaceTempView("kernel_docs")
    val rows = spark.sql(
      """SELECT simhash16(text) AS sh, min_shingle_fp(text, 5) AS fp
        |FROM kernel_docs WHERE text = 'one two three four five six seven'""".stripMargin)
      .collect()
    assert(rows.length == 1 && rows(0).getString(0).length == 16 &&
      rows(0).getString(1).length == 32)
  }

  test("md5_prefix64 in SQL matches the kernel and the DuckDB hex form") {
    graft.plans.GraftExtensions.install(spark)
    val got = spark.sql("SELECT md5_prefix64('click.7') AS h").collect()(0).getLong(0)
    val direct = graft.functions.TextHash.md5Prefix64(
      org.apache.spark.unsafe.types.UTF8String.fromString("click.7"))
    assert(got == direct)
    // the DuckDB twin: first 15 md5 hex chars as a long (60-bit, ≥ 0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("click.7".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(15)
    assert(got == java.lang.Long.parseLong(hex, 16) && got >= 0L)
  }
}
