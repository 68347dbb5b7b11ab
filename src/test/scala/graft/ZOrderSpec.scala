package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Pins the Morton kernel against a per-bit reference, and — the claim
  * that matters at 100 TB — MEASURES on the scan's own metrics that one
  * z-ordered physical sort prunes row groups for predicates on EITHER
  * dimension, where a single-column sort can only serve its own. */
class ZOrderSpec extends SparkSpec {

  test("mask-shift interleave equals the per-bit reference on random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(1000)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = pairs.map { case (a, b) => ZOrder.interleaveRef(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got $g want $w") }
  }

  test("interleave is monotone per dimension with the other held fixed") {
    // a Morton range therefore brackets a rectangle — the property the
    // range-partitioned layout's locality argument rests on
    for (fix <- Seq(0, 1234, 65535); x <- Seq(0, 1, 999, 65534))
      assert(ZOrder.interleaveRef(x, fix) < ZOrder.interleaveRef(x + 1, fix) &&
        ZOrder.interleaveRef(fix, x) < ZOrder.interleaveRef(fix, x + 1))
  }

  /** Rows the scan actually emitted = rows in row groups that survived
    * min/max pruning (the pushed filter re-runs above the scan, so this
    * metric isolates the skipping). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, s"no file scan in plan:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("one z-ordered sort prunes row groups for BOTH the entity and the time predicate") {
    import spark.implicits._
    // 64 entities × 64 days × 4 rows — small enough that each of the 64
    // output files is one row group, so file stats ARE row-group stats.
    // With N range partitions over the 2-D Morton space an equality on
    // one dimension hits ~√N of them, so N=64 gives the entity path an
    // ~8× expected skip for the ≥4× assertion below
    val day0 = java.time.LocalDate.parse("2024-01-01")
    val rows = for {
      e <- 0 until 64; d <- 0 until 64; k <- 0 until 4
    } yield (
      java.sql.Timestamp.from(day0.plusDays(d.toLong).atStartOfDay
        .plusHours(k * 6L).toInstant(java.time.ZoneOffset.UTC)),
      f"e$e%02d.1", s"$k.00", "{}")
    val df = rows.toDF("time", "entity_id", "state", "attributes")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    graft.operators.Queries.zorderWrite(df, s"$dir/z", 64)
    val z = spark.read.parquet(s"$dir/z")
    val total = rows.size.toLong

    // entity equality: only row groups whose entity range covers e17
    val byEntity = scannedRows(z.filter(col("entity_id") === "e17.1"))
    assert(byEntity < total / 2,
      s"entity predicate must prune row groups: scanned $byEntity of $total")
    // time range: one week out of nine
    val t0 = java.sql.Timestamp.from(
      day0.plusDays(20).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
    val t1 = java.sql.Timestamp.from(
      day0.plusDays(27).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
    val byTime = scannedRows(z.filter(col("time").between(lit(t0), lit(t1))))
    assert(byTime < total / 2,
      s"time predicate must prune row groups: scanned $byTime of $total")

    // the contrast: a time-sorted layout cannot prune the entity path —
    // every row group spans (nearly) all entities
    df.repartitionByRange(64, col("time")).sortWithinPartitions(col("time"))
      .write.parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    val timeSortedByEntity = scannedRows(t.filter(col("entity_id") === "e17.1"))
    assert(timeSortedByEntity >= total,
      s"time-sorted layout was expected to scan everything for an entity " +
        s"equality, got $timeSortedByEntity of $total")
    assert(byEntity * 4 <= timeSortedByEntity,
      s"z-order must beat the time sort ≥4× on the entity path: " +
        s"$byEntity vs $timeSortedByEntity")

    // and the layout is LOSSLESS: the 2-D slice equals the direct filter
    val zSlice = z.filter(col("entity_id") === "e17.1" &&
        col("time").between(lit(t0), lit(t1)))
      .select("time", "entity_id", "state").collect().toSet
    val direct = df.filter(col("entity_id") === "e17.1" &&
        col("time").between(lit(t0), lit(t1)))
      .select("time", "entity_id", "state").collect().toSet
    assert(zSlice == direct && zSlice.nonEmpty)
  }
}
