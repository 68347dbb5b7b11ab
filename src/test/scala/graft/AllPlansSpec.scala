package graft

/** Blanket physical-plan safety net over EVERY registered query: a
  * CartesianProduct anywhere is a scale bug by definition (every
  * intentional small-side cross is an explicit `broadcast(...)`, which
  * plans as BroadcastNestedLoopJoin with a bounded build side). Catches
  * the failure mode where a join condition quietly stops being an
  * equi-join — per-query specs each pin their own plan, this pins the
  * whole surface. */
class AllPlansSpec extends SparkSpec {

  test("no registered query plans a CartesianProduct") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(bad.isEmpty, s"cartesian products in: ${bad.mkString(", ")}")
  }
}
