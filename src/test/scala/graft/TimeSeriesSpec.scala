package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

/** Pins the hyperfunction semantics on a hand-computed fixture: LOCF
  * carry, interior linear interpolation, duration-weighted averaging,
  * and counter-reset handling. */
class TimeSeriesSpec extends SparkSpec {

  private val H = 3600000000L // 1h in µs

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  /** (time, entity_id, state) rows in the LTSS shape. */
  private def ltssOf(rows: Seq[(Timestamp, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("time", "entity_id", "state")
  }

  // one entity, observations at hours 0, 1, 4 (gap at 2 and 3)
  private lazy val gappy = ltssOf(Seq(
    (ts(0), "click.1", "10.00"),
    (ts(1), "click.1", "20.00"),
    (ts(4), "click.1", "50.00")))

  test("gapfill LOCF carries the last observation across gap buckets") {
    val out = TimeSeries.gapfillLocf(gappy, H).orderBy("bucket")
      .select("locf", "is_gap").collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(out.toSeq == Seq((10.0, 0), (20.0, 0), (20.0, 1), (20.0, 1), (50.0, 0)))
  }

  test("gapfill interpolation draws the line between neighbors") {
    val out = TimeSeries.gapfillInterpolate(gappy, H).orderBy("bucket")
      .select("interp").collect().map(_.getDouble(0))
    // 20 → 50 over 3 hours: 30, 40 at the two gap buckets
    assert(out.toSeq == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("gapfill grid is per-entity: entities span only their own range") {
    val two = ltssOf(Seq(
      (ts(0), "click.1", "1.00"), (ts(3), "click.1", "4.00"),
      (ts(1), "click.2", "2.00"), (ts(2), "click.2", "3.00")))
    val n = TimeSeries.gapfillLocf(two, H)
      .groupBy("entity_id").count().orderBy("entity_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(n.toSeq == Seq(("click.1", 4L), ("click.2", 2L)))
  }

  test("gapfill grid spans day boundaries seamlessly (two-level day axis)") {
    val span = ltssOf(Seq(
      (Timestamp.valueOf("2024-01-01 22:00:00"), "click.1", "1.00"),
      (Timestamp.valueOf("2024-01-03 02:00:00"), "click.1", "2.00")))
    val out = TimeSeries.gapfillLocf(span, H).orderBy("bucket").collect()
    assert(out.length == 29, "22:00 day1 .. 02:00 day3 inclusive = 29 hourly buckets")
    assert(out.map(_.getAs[Double]("locf")).distinct.toSeq == Seq(1.0, 2.0))
    assert(out.count(_.getAs[Int]("is_gap") == 0) == 2)
  }

  test("gapfill with a width that does not divide a day (single-level axis)") {
    val w7h = 7L * 3600000000L
    // 7h buckets are epoch-aligned: 2024-01-01 00:00/01:00 fall in the
    // bucket starting 2023-12-31 19:00 (last obs 20.0), 04:00 in the
    // adjacent 02:00 bucket (50.0) — two rows, no gap between them
    val out = TimeSeries.gapfillLocf(gappy, w7h).orderBy("bucket").collect()
    assert(out.map(r => (r.getAs[Double]("locf"), r.getAs[Int]("is_gap"))).toSeq ==
      Seq((20.0, 0), (50.0, 0)))
  }

  test("bucketLast keeps the latest observation per bucket") {
    val dup = ltssOf(Seq(
      (ts(0, 10), "click.1", "1.00"),
      (ts(0, 50), "click.1", "7.00")))
    val out = TimeSeries.gapfillLocf(dup, H).select("observed").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(7.0))
  }

  test("time-weighted average weights values by held duration") {
    // 10 held 1h, 20 held 3h → (10·1 + 20·3) / 4 = 17.5; last obs open-ended (dropped)
    val out = TimeSeries.timeWeightedAvg(gappy).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("twa") == 17.5)
    assert(out.head.getAs[Long]("covered_us") == 4 * H)
  }

  test("ohlc: open/close by time order, high/low extremes, one bucket row") {
    val candle = ltssOf(Seq(
      (ts(0, 5), "click.1", "12.00"),
      (ts(0, 20), "click.1", "30.00"),
      (ts(0, 40), "click.1", "4.00"),
      (ts(0, 55), "click.1", "18.00")))
    val out = TimeSeries.ohlc(candle).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getAs[Double]("open"), r.getAs[Double]("high"),
      r.getAs[Double]("low"), r.getAs[Double]("close"), r.getAs[Long]("n")) ==
      ((12.0, 30.0, 4.0, 18.0, 4L)))
  }

  test("lttb keeps endpoints and the shape-dominant spike per bucket") {
    // 6 points → 4: middle indices 1..4 split into two buckets; the
    // spikes (10 at h1, 9 at h4) maximize the triangle areas
    val series = ltssOf(Seq(
      (ts(0), "click.1", "0.00"),
      (ts(1), "click.1", "10.00"),
      (ts(2), "click.1", "1.00"),
      (ts(3), "click.1", "1.00"),
      (ts(4), "click.1", "9.00"),
      (ts(5), "click.1", "0.00")))
    val out = TimeSeries.lttb(series, 4).orderBy("time")
      .select("sv").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(0.0, 10.0, 9.0, 0.0))
  }

  test("lttb passes short series through and distributes per entity") {
    val two = ltssOf(Seq(
      (ts(0), "click.1", "1.00"), (ts(1), "click.1", "2.00"),
      (ts(0), "click.2", "3.00")))
    val out = TimeSeries.lttb(two, 4).collect()
    assert(out.length == 3, "series shorter than nOut are kept whole")
  }

  test("lttbBucketed bounds the pick input at the bucket grid, not raw rows") {
    // deliberately oversized raw series: 5000 observations inside 10
    // hours — the hourly grid reduces the pick's input to 10 rows
    // (bucket-last survivors), so the per-task buffer is render-sized
    // no matter how dense the raw series is
    val dense = ltssOf((0 until 5000).map { i =>
      (new Timestamp(ts(0).getTime + i * 7200L), "click.1", f"${i / 100.0}%.2f")
    })
    val out = TimeSeries.lttbBucketed(dense, H, nOut = 6)
      .orderBy("time").collect()
    assert(out.length == 6)
    // every pick is a bucket-grid point: hour-aligned timestamp carrying
    // that bucket's LAST raw observation
    assert(out.forall(_.getAs[Timestamp]("time").getTime % 3600000L == 0))
    val lastOfBucket = (0 until 10).map { h =>
      (ts(h).getTime, (0 until 5000).filter { i =>
        (ts(0).getTime + i * 7200L) / 3600000L == ts(h).getTime / 3600000L
      }.max / 100.0)
    }.toMap
    assert(out.forall(r =>
      lastOfBucket(r.getAs[Timestamp]("time").getTime) == r.getAs[Double]("sv")))
    // endpoints of the bucket grid always kept
    assert(out.head.getAs[Timestamp]("time") == ts(0))
    assert(out.last.getAs[Timestamp]("time") == ts(9))
  }

  test("lttbSelect invariants: size, endpoints, order, subset (100 random series)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 100) {
      val n = 3 + rnd.nextInt(200)
      val nOut = 3 + rnd.nextInt(30)
      val arr = (0 until n).map { i =>
        graft.operators.TimeSeries.TsPoint(
          "e", new Timestamp(i * 60000L), rnd.nextInt(1000) / 10.0)
      }
      val out = graft.operators.TimeSeries.lttbSelect(arr, nOut).toSeq
      assert(out.size == math.min(n, nOut), s"trial $trial size")
      assert(out.head == arr.head && out.last == arr.last, s"trial $trial endpoints")
      assert(out.map(_.time.getTime) == out.map(_.time.getTime).sorted, s"trial $trial order")
      assert(out.forall(arr.contains), s"trial $trial subset")
    }
  }

  test("counter rate: decreases count as resets, increases as deltas") {
    val counter = ltssOf(Seq(
      (ts(0, 10), "purchase.1", "100.00"),
      (ts(0, 20), "purchase.1", "150.00"), // +50
      (ts(0, 30), "purchase.1", "30.00"),  // reset → +30
      (ts(0, 40), "purchase.1", "40.00"))) // +10
    val out = TimeSeries.counterRate(counter).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("delta_sum") == 90.0)
    assert(out.head.getAs[Double]("rate_per_s") == 90.0 / 3600.0)
    assert(out.head.getAs[Long]("n") == 3L)
  }

  test("state_agg: held durations accumulate per state class") {
    // low (10) held 1h, mid (30) held 2h, low (15) held 1h, last obs open
    val s = ltssOf(Seq(
      (ts(0), "view.1", "10.00"),
      (ts(1), "view.1", "30.00"),
      (ts(3), "view.1", "15.00"),
      (ts(4), "view.1", "99.00")))
    val out = TimeSeries.stateAgg(s).orderBy("state_class").collect().map(r =>
      (r.getAs[String]("state_class"), r.getAs[Long]("duration_us"),
        r.getAs[Long]("n_intervals"), r.getAs[Double]("fraction")))
    assert(out.toSeq == Seq(("low", 2 * H, 2L, 0.5), ("mid", 2 * H, 1L, 0.5)))
  }

  test("moving average: trailing range frame includes only the window, inclusive") {
    // 24h window: observation at 26h sees only itself + 4h/2h neighbors
    val s = ltssOf(Seq(
      (ts(0), "purchase.1", "10.00"),
      (ts(22), "purchase.1", "20.00"),
      (Timestamp.valueOf("2024-01-02 00:00:00"), "purchase.1", "30.00"),  // 24h
      (Timestamp.valueOf("2024-01-02 02:00:00"), "purchase.1", "40.00"))) // 26h
    val out = TimeSeries.movingAvg(s).orderBy("time")
      .select("ma", "n_window").collect().map(r => (r.getDouble(0), r.getLong(1)))
    // 24h row: [0h,24h] inclusive → all of 10,20,30; 26h row: (2h,26h] → 20,30,40
    assert(out.toSeq == Seq((10.0, 1L), (15.0, 2L), (20.0, 3L), (30.0, 3L)))
  }

  test("rate anomaly: only the spike bucket flags, z matches the exact moments") {
    // 16 hourly buckets: fourteen 1-count, one 2-count, one 30-count spike.
    // n=16, S1=46, S2=918 → spike d=434, n·S2−S1²=12572: d²>9·varn (z≈3.87)
    val rows = (0 until 14).map(h => (ts(h), "click.1", "1.00")) ++
      Seq((ts(14), "click.1", "1.00"), (ts(14, 30), "click.1", "2.00")) ++
      (0 until 30).map(m => (ts(15, m), "click.1", "3.00"))
    val out = TimeSeries.rateAnomaly(ltssOf(rows)).orderBy("bucket").collect()
    assert(out.length == 16)
    assert(out.map(_.getAs[Int]("is_anomaly")).sum == 1)
    val spike = out.last
    assert(spike.getAs[Long]("n_events") == 30L)
    assert(spike.getAs[Int]("is_anomaly") == 1)
    assert(math.abs(spike.getAs[Double]("z") - 434.0 / math.sqrt(12572.0)) == 0.0)
  }

  test("heartbeat: liveness-clipped uptime, outage count, span") {
    // heartbeats at 0h, 1h, 5h with 2h liveness: gaps 1h (live) + 4h
    // (2h live + 2h down, one outage); span 5h
    val s = ltssOf(Seq(
      (ts(0), "signup.1", "1.00"),
      (ts(1), "signup.1", "2.00"),
      (ts(5), "signup.1", "3.00"),
      (ts(2), "signup.2", "9.00"))) // single heartbeat: no span → dropped
    val out = TimeSeries.heartbeat(s, 2 * H).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("entity_id") == "signup.1")
    assert(r.getAs[Long]("n_heartbeats") == 3L)
    assert(r.getAs[Long]("span_us") == 5 * H)
    assert(r.getAs[Long]("uptime_us") == 3 * H)
    assert(r.getAs[Long]("downtime_us") == 2 * H)
    assert(r.getAs[Double]("uptime_ratio") == 0.6)
    assert(r.getAs[Long]("n_outages") == 1L)
  }

  test("state timeline splits a midnight-crossing hold interval exactly across days") {
    // hold interval [23:00 Jan 1, 01:00 Jan 2) in class 'low' (sv=10):
    // one hour lands in each day; the closing reading holds nothing
    val l = ltssOf(Seq(
      (Timestamp.valueOf("2024-01-01 23:00:00"), "view.1", "10"),
      (Timestamp.valueOf("2024-01-02 01:00:00"), "view.1", "30")))
    val out = TimeSeries.stateTimeline(l)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getAs[Timestamp]("bucket").toString,
        r.getAs[String]("state_class"), r.getAs[Long]("duration_us"),
        r.getAs[Long]("n_intervals"))).toSeq
    assert(out == Seq(
      ("2024-01-01 00:00:00.0", "low", H, 1L),
      ("2024-01-02 00:00:00.0", "low", H, 1L)), s"got $out")
  }

  test("ewma matches the textbook adjust=true weighting (α = 1/2) within the span") {
    val xs = Seq(10.0, 20.0, 40.0, 30.0, 50.0)
    val rows = xs.zipWithIndex.map { case (v, i) => (ts(i), "click.1", f"$v%.2f") }
    val out = TimeSeries.ewma(ltssOf(rows)).orderBy("time")
      .select("ewma", "n_window").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    // reference: Σ_j 2⁻ʲ·x_{t−j} / Σ_j 2⁻ʲ — the series is shorter than
    // the span, so the closed form must equal the untruncated weighting
    val expected = xs.indices.map { t =>
      val num = (0 to t).map(j => math.pow(0.5, j) * xs(t - j)).sum
      num / (0 to t).map(j => math.pow(0.5, j)).sum
    }
    out.map(_._1).zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g want $e") }
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ewma truncates: an observation older than the span stops contributing") {
    val xs = 1000000.0 +: Seq.fill(TimeSeries.EwmaSpan)(0.0)
    val rows = xs.zipWithIndex.map { case (v, i) => (ts(i), "click.1", f"$v%.2f") }
    val out = TimeSeries.ewma(ltssOf(rows)).orderBy("time")
      .select("ewma").collect().map(_.getDouble(0))
    assert(out(TimeSeries.EwmaSpan - 1) > 0.0) // span-th row still sees x₀ at 2⁻¹⁵
    assert(out(TimeSeries.EwmaSpan) == 0.0) // one row later x₀ has aged out exactly
  }

  test("cagg reconcile merges late partials into touched buckets only") {
    import spark.implicits._
    val B0 = 1704067200000000L // 2024-01-01T00Z, hour-aligned
    val B1 = B0 + H
    val B2 = B0 + 2 * H
    val mat = Seq(
      ("a.1", B0, 2L, "30.00"), // values 10 + 20 already materialized
      ("a.1", B1, 1L, "5.00"),  // untouched: must NOT reappear
      ("b.1", B0, 1L, "7.00"))
      .toDF("entity_id", "bus", "cnt", "ssum")
      .withColumn("ssum", col("ssum").cast("decimal(32,2)"))
    val late = Seq(
      (new java.sql.Timestamp(B0 / 1000 + 60000), "a.1", "40.00"), // lands in B0
      (new java.sql.Timestamp(B2 / 1000), "b.1", "1.00"))          // NEW bucket
      .toDF("time", "entity_id", "state")
    val out = TimeSeries.reconcile(mat, late)
      .orderBy("entity_id", "bucket")
      .as[(String, java.sql.Timestamp, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("a.1", new java.sql.Timestamp(B0 / 1000), 3L, 70.0, 70.0 / 3.0),
      ("b.1", new java.sql.Timestamp(B2 / 1000), 1L, 1.0, 1.0)), s"got $out")
  }

  test("drawdown picks the largest peak-to-trough drop with its peak and trough") {
    val rows = Seq(10.0, 30.0, 25.0, 5.0, 28.0, 12.0).zipWithIndex
      .map { case (v, i) => (ts(i), "click.1", f"$v%.2f") }
    val r = TimeSeries.drawdown(ltssOf(rows)).collect().head
    assert(r.getAs[Long]("n_obs") == 6L)
    assert(r.getAs[Double]("peak_sv") == 30.0)
    assert(r.getAs[Double]("trough_sv") == 5.0)
    assert(r.getAs[Timestamp]("trough_time") == ts(3))
    assert(r.getAs[Double]("max_dd") == 25.0)
    assert(math.abs(r.getAs[Double]("rel_dd") - 25.0 / 30.0) < 1e-12)
  }

  test("drawdown tie rule: equal drawdowns resolve to the earliest trough") {
    val rows = Seq(10.0, 5.0, 8.0, 5.0).zipWithIndex
      .map { case (v, i) => (ts(i), "click.1", f"$v%.2f") }
    val r = TimeSeries.drawdown(ltssOf(rows)).collect().head
    assert(r.getAs[Double]("max_dd") == 5.0)
    assert(r.getAs[Timestamp]("trough_time") == ts(1))
  }

  test("drawdown on a non-positive peak reports the drop but a NULL ratio") {
    val rows = Seq(-5.0, -8.0).zipWithIndex
      .map { case (v, i) => (ts(i), "click.1", f"$v%.2f") }
    val r = TimeSeries.drawdown(ltssOf(rows)).collect().head
    assert(r.getAs[Double]("max_dd") == 3.0)
    assert(r.isNullAt(r.fieldIndex("rel_dd")))
  }

  test("drawdown collapses duplicate timestamps by MAX before the running peak") {
    val rows = Seq(
      (ts(0), "click.1", "10.00"), (ts(0), "click.1", "12.00"),
      (ts(1), "click.1", "4.00"))
    val r = TimeSeries.drawdown(ltssOf(rows)).collect().head
    assert(r.getAs[Long]("n_obs") == 2L)
    assert(r.getAs[Double]("peak_sv") == 12.0)
    assert(r.getAs[Double]("max_dd") == 8.0)
    assert(math.abs(r.getAs[Double]("rel_dd") - 8.0 / 12.0) < 1e-12)
  }

  // crossCorr fixture: purchase is click shifted right by exactly 1 hour, so
  // the (click, purchase) pair must peak at lag +1 (purchase lags click).
  private lazy val shifted = {
    val clicks = Seq(1, 5, 2, 8, 3, 9, 4).zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)((ts(h), "click.1", "1.00"))
    }
    val purchases = Seq(1, 5, 2, 8, 3, 9, 4).zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)((ts(h + 1), "purchase.1", "1.00"))
    }
    ltssOf(clicks ++ purchases)
  }

  test("crossCorr peaks at the true lag of a shifted copy, with r ≈ 1") {
    val rows = TimeSeries.crossCorr(shifted, maxLag = 2).collect()
    assert(rows.forall(r => r.getAs[String]("da") == "click"
      && r.getAs[String]("db") == "purchase"))
    // all correlations within [-1, 1] (Cauchy–Schwarz, full-grid energies)
    assert(rows.forall(r => math.abs(r.getAs[Double]("xcorr")) <= 1.0 + 1e-12))
    val best = rows.maxBy(_.getAs[Double]("xcorr"))
    assert(best.getAs[Int]("lag") == 1)
    // the shared grid zero-pads each series' missing edge hour, which
    // shifts the means the deviations are taken against — the peak
    // stays decisively at the true lag but short of 1
    assert(best.getAs[Double]("xcorr") > 0.7)
    val rest = rows.filter(_.getAs[Int]("lag") != 1).map(_.getAs[Double]("xcorr"))
    assert(rest.forall(_ < best.getAs[Double]("xcorr") - 0.2))
  }

  test("crossCorr lag-0 of identical series is exactly the energy ratio 1") {
    val twin = ltssOf(Seq(1, 4, 2, 6).zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)((ts(h), "click.1", "1.00")) ++
        Seq.fill(c)((ts(h), "purchase.1", "1.00"))
    })
    val r0 = TimeSeries.crossCorr(twin, maxLag = 1).collect()
      .find(_.getAs[Int]("lag") == 0).get
    assert(r0.getAs[Double]("xcorr") == 1.0)
  }

  test("asapSmooth: an alternating series picks the smallest period-multiple window") {
    // hourly counts 1,3,1,3,... for 26 hours: any EVEN window's trailing
    // sum is constant (d = c_t − c_{t−w} = 0 → roughness 0); odd windows
    // keep the alternation. Tie among even windows → smallest w = 2.
    val rows = (0 until 26).flatMap(h =>
      Seq.fill(if (h % 2 == 0) 1 else 3)((ts(h), "click.1", "1.00")))
    val out = TimeSeries.asapSmooth(ltssOf(rows)).collect()
    val best = out.filter(_.getAs[Int]("is_best") == 1)
    assert(best.length == 1)
    assert(best.head.getAs[Int]("w") == 2)
    assert(best.head.getAs[Double]("roughness") == 0.0)
    // every even candidate is perfectly smooth, every odd one is not
    for (r <- out) {
      val (w, rough) = (r.getAs[Int]("w"), r.getAs[Double]("roughness"))
      if (w % 2 == 0) assert(rough == 0.0, s"even w=$w must cancel the alternation")
      else assert(rough > 0.0, s"odd w=$w must keep the alternation")
    }
  }

  test("saxMotif: constant-then-spike series yields the expected top word") {
    // hours 0..5: counts 1,1,1,1,1,9 → terciles put the five 1s in
    // a/b and the spike in c; sliding words are dominated by low-rank runs
    val rows = (0 to 5).flatMap(h =>
      Seq.fill(if (h == 5) 9 else 1)((ts(h), "click.1", "1.00")))
    val out = TimeSeries.saxMotif(ltssOf(rows)).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("word").length == 3))
    // every symbol drawn from {a,b,c}
    assert(out.forall(_.getAs[String]("word").forall(c => c >= 'a' && c <= 'c')))
    // ranks are 1..3 and counts non-increasing in rank
    val byRank = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("cnt"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }
}
