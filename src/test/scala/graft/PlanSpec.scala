package graft

import graft.operators.{Dedup, Similarity}

/** Plan-shape assertions for the scale-sensitive operators: these pin the
  * physical plan properties the 100 TB design relies on, not just result
  * correctness. */
class PlanSpec extends SparkSpec {

  test("fanOut is gated: no repartition when the scan already has enough partitions") {
    val wide = spark.range(0, 100, 1, 8).toDF("id")
    assert(Tables.fanOut(wide) eq wide) // same object — no exchange added
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
    assert(Tables.fanOut(narrow).rdd.getNumPartitions ==
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }

  test("minhash LSH self-join reads the persisted band frame on both sides") {
    val df = Dedup.minhashLsh.run(spark, "/root/testdata/sf0.001")
    df.count() // materialize the cache + finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    val cacheScans =
      "InMemoryTableScan".r.findAllIn(plan).size + "TableCacheQueryStage".r.findAllIn(plan).size
    assert(cacheScans >= 2,
      s"expected both join sides to scan the cached band frame; plan:\n$plan")
    // the expensive signature aggregate must not appear in the join plan
    // at all — it ran once, inside the cache materialization
    assert(!plan.contains("HashAggregate(keys=[doc_id"),
      s"signature aggregate leaked past the cache; plan:\n$plan")
  }

  test("IVF probe scan is partition-pruned to the query's cluster") {
    val df = Similarity.ivfProbe.run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"expected a cid partition filter on the layout scan; plan:\n$plan")
  }
}
