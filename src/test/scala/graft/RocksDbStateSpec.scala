package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The heaviest stateful streaming twins on the RocksDB state store —
  * the provider a 100 TB deployment actually runs (state larger than
  * executor heap, changelog checkpointing), vs the default HDFS-backed
  * in-memory map every other suite exercises. Same operators, same
  * checkpoint-restart protocol, provider swapped via
  * `spark.sql.streaming.stateStore.providerClass` — green here proves
  * the state contracts (TTL eviction, restart recovery, partial
  * emission) are not provider-coupled. rocksdbjni ships with Spark, so
  * this runs everywhere the engine does. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `f` with the RocksDB provider set on the shared session,
    * restoring the previous provider after — the setting is read at
    * query start and recorded into the checkpoint, so scoping it to
    * the test body is sufficient AND required (suites run sequentially
    * in the forked test JVM). */
  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, Provider)
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("near-dup retention + checkpoint restart recover on RocksDB state") {
    withRocksDb {
      val in = tmp("rdb-nd-in"); val out = tmp("rdb-nd-out"); val ckpt = tmp("rdb-nd-ckpt")
      val base = (1 to 30).map(i => s"w$i").mkString(" ")
      val hourUs = 3600000000L
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id LONG, text STRING, ingest_time TIMESTAMP")
      def start() = StreamingOps
        .nearDupStream(spark.readStream.schema(schema).json(in), retentionUs = hourUs)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def doc(id: Long, t: String) =
        s"""{"doc_id":$id,"text":"$base","ingest_time":"${t}Z"}"""
      Files.writeString(Paths.get(in, "b1.json"),
        doc(1, "2024-01-01T10:00:00") + "\n" + doc(2, "2024-01-01T10:30:00"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // beyond the horizon: 1+2 age out; 3 registers fresh, 4 pairs with 3
      Files.writeString(Paths.get(in, "b2.json"), doc(3, "2024-01-01T13:00:00"))
      Files.writeString(Paths.get(in, "b3.json"), doc(4, "2024-01-01T13:30:00"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      // third cold start: recovered ROCKSDB state must still carry 3+4
      Files.writeString(Paths.get(in, "b4.json"), doc(5, "2024-01-01T13:45:00"))
      val q3 = start(); q3.processAllAvailable(); q3.stop()
      // the checkpoint's own metadata proves which provider held the state
      val confLines = new String(Files.readAllBytes(
        Paths.get(ckpt, "offsets", "0")), "UTF-8")
      assert(confLines.contains("RocksDBStateStoreProvider"),
        s"checkpoint does not record the RocksDB provider: $confLines")
      val pairs = spark.read.parquet(out)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
      assert(pairs == Set((1L, 2L), (3L, 4L), (3L, 5L), (4L, 5L)),
        s"RocksDB-held retention state diverged: $pairs")
    }
  }

  test("core-convoy twin alive classes survive a checkpoint restart on RocksDB state") {
    withRocksDb {
      import graft.streaming.StreamingOps.HourGroupRow
      val in = tmp("rdb-core-in"); val out = tmp("rdb-core-out")
      val ckpt = tmp("rdb-core-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "hr LONG, gid LONG, n_members LONG, members STRING")
      def start() = StreamingOps.convoyGroupsCoreStream(
        spark.readStream.schema(schema).json(in).as[HourGroupRow])
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def row(hr: Long, gid: Long, mem: String) =
        s"""{"hr":$hr,"gid":$gid,"n_members":${mem.split(',').length},"members":"$mem"}"""
      // run 1: the 3-core opens at hour 100 and survives hour 101 —
      // the alive class (and the processed frontier) park in RocksDB
      Files.writeString(Paths.get(in, "b1.json"),
        row(100L, 1L, "1,2,3") + "\n" + row(101L, 1L, "1,2,3"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // run 2, cold start: hour 102 must CONTINUE the recovered class
      // (a lost since-hour would misdate the episode), then the gap
      // hour closes it
      Files.writeString(Paths.get(in, "b2.json"), row(102L, 1L, "1,2,3"))
      Files.writeString(Paths.get(in, "b3.json"), row(200L, 9L, "7,8,9"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val confLines = new String(Files.readAllBytes(
        Paths.get(ckpt, "offsets", "0")), "UTF-8")
      assert(confLines.contains("RocksDBStateStoreProvider"),
        s"checkpoint does not record the RocksDB provider: $confLines")
      val eps = spark.read.parquet(out)
        .as[graft.operators.Queries.ConvoyCoreEp].collect().toSeq
      assert(eps == Seq(graft.operators.Queries.ConvoyCoreEp(
        1L, 3L, "1,2,3", 100L, 3L, 102L)),
        s"RocksDB-recovered core class diverged: $eps")
    }
  }

  test("cagg maintenance partials + restart recover on RocksDB state") {
    withRocksDb {
      val in = tmp("rdb-cg-in"); val out = tmp("rdb-cg-out"); val ckpt = tmp("rdb-cg-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, entity_id STRING, state STRING")
      def start() = StreamingOps
        .caggMaintainStream(spark.readStream.schema(schema).json(in),
          watermark = "0 seconds")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def ev(t: String, e: String, s: String) =
        s"""{"time":"${t.replace(' ', 'T')}Z","entity_id":"$e","state":"$s"}"""
      Files.writeString(Paths.get(in, "b1.json"), Seq(
        ev("2024-01-01 10:05:00", "a.1", "10.00"),
        ev("2024-01-01 10:40:00", "a.1", "20.50"),
        ev("2024-01-01 11:10:00", "a.1", "1.25"),
        ev("2024-01-01 10:30:00", "b.1", "5.00")).mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // restart: the open 10h/11h windows live in RocksDB now; advancing
      // the watermark after recovery must close them with NOTHING lost
      Files.writeString(Paths.get(in, "b2.json"), ev("2024-01-01 14:00:00", "z.1", "0.00"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      Files.writeString(Paths.get(in, "b3.json"), ev("2024-01-01 15:00:00", "z.1", "0.00"))
      val q3 = start(); q3.processAllAvailable(); q3.stop()
      val merged = spark.read.parquet(out)
        .groupBy($"entity_id", $"bus")
        .agg(sum($"cnt").as("n"), sum($"ssum").cast("double").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .filter(_._1 != "z.1").toSet
      val H = 3600000000L
      val bus10 = ts("2024-01-01 10:00:00").getTime * 1000L -
        (ts("2024-01-01 10:00:00").getTime * 1000L) % H
      assert(merged == Set(
        ("a.1", bus10, 2L, 30.5),
        ("a.1", bus10 + H, 1L, 1.25),
        ("b.1", bus10, 1L, 5.0)),
        s"RocksDB-recovered cagg windows diverged: $merged")
    }
  }

  test("CMS cells survive a checkpoint restart on RocksDB state") {
    withRocksDb {
      def md5p(s: String): Long = graft.functions.TextHash.md5Prefix64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val in = tmp("rdb-cms-in"); val ckpt = tmp("rdb-cms-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL("state STRING")
      // memory sink refuses checkpoint recovery; collect Update-mode
      // emissions through foreachBatch (checkpoint-compatible) instead
      val emitted = new scala.collection.concurrent.TrieMap[(Int, Long), Long]
      def start() = StreamingOps
        .cmsStream(spark.readStream.schema(schema).json(in), depth = 2, width = 8)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.CmsCell], _: Long) =>
          b.collect().foreach(c => emitted.updateWith((c.d, c.bucket))(
            o => Some(math.max(o.getOrElse(0L), c.cell))))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      Files.writeString(Paths.get(in, "b1.json"),
        """{"state":"a"}""" + "\n" + """{"state":"b"}""" + "\n" + """{"state":"a"}""")
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // restart from the checkpoint: the 256-cell grid lives in RocksDB;
      // the next batch must INCREMENT recovered cells, not restart at 1
      Files.writeString(Paths.get(in, "b2.json"), """{"state":"a"}""")
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val cells = emitted.toMap
      val expect = Seq("a", "b", "a", "a")
        .flatMap(s => (0 until 2).map(d => (d, md5p(s"$d:$s") % 8)))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(cells == expect,
        s"RocksDB-recovered CMS cells diverged: $cells vs $expect")
    }
  }

  test("SpaceSaving counters survive a checkpoint restart on RocksDB state") {
    withRocksDb {
      val in = tmp("rdb-ss-in"); val ckpt = tmp("rdb-ss-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "entity_id STRING, state STRING")
      val emitted = new scala.collection.concurrent.TrieMap[String, (Long, Long)]
      def start() = StreamingOps
        .heavyHittersStream(spark.readStream.schema(schema).json(in), k = 3)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.HeavyHitter], _: Long) =>
          b.collect().foreach(h => emitted.updateWith(h.state)(o =>
            Some(if (o.exists(_._1 >= h.est)) o.get else (h.est, h.err))))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      def ev(s: String) = s"""{"entity_id":"click.1","state":"$s"}"""
      Files.writeString(Paths.get(in, "b1.json"),
        Seq("a", "a", "a", "b").map(ev).mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // restart: the Map-typed counter state must round-trip RocksDB;
      // a's recovered counter continues from 3, not from scratch
      Files.writeString(Paths.get(in, "b2.json"), Seq("a", "c").map(ev).mkString("\n"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      assert(emitted("a") == ((4L, 0L)),
        s"recovered counter must continue at 4 exact: ${emitted.toMap}")
      assert(emitted("b") == ((1L, 0L)) && emitted("c") == ((1L, 0L)))
    }
  }

  test("hampel ring + restart: the held window recovers and the spike verdict lands on RocksDB") {
    withRocksDb {
      val in = tmp("rdb-hp-in"); val out = tmp("rdb-hp-out"); val ckpt = tmp("rdb-hp-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, entity_id STRING, state STRING")
      def start() = StreamingOps
        .hampelStream(spark.readStream.schema(schema).json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def ev(t: String, v: String) =
        s"""{"time":"${t}Z","entity_id":"p.a","state":"$v"}"""
      // the spike (99) arrives BEFORE the restart; its verdict needs the
      // two samples that arrive AFTER — only a recovered ring can emit it
      Files.writeString(Paths.get(in, "b1.json"), Seq(
        ev("2024-01-01T10:00:00", "10.00"), ev("2024-01-01T10:01:00", "10.20"),
        ev("2024-01-01T10:02:00", "10.10"), ev("2024-01-01T10:03:00", "99.00"))
        .mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      Files.writeString(Paths.get(in, "b2.json"), Seq(
        ev("2024-01-01T10:04:00", "10.30"), ev("2024-01-01T10:05:00", "10.20"),
        ev("2024-01-01T10:06:00", "10.05")).mkString("\n"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val rows = spark.read.parquet(out)
        .selectExpr("time", "is_spike", "filtered")
        .as[(java.sql.Timestamp, Int, Option[Double])]
        .collect().sortBy(_._1.getTime).toSeq
      assert(rows.size == 5, s"7 samples, 2 held: $rows") // indices 0..4 emitted
      val spike = rows.filter(_._2 == 1)
      assert(spike.map(r => (r._1, r._3)) ==
        Seq((ts("2024-01-01 10:03:00"), Some(10.20))),
        s"the cross-restart spike verdict diverged: $rows")
    }
  }

  test("open track segment + restart: the month closes from RocksDB-held fixes") {
    withRocksDb {
      val in = tmp("rdb-tk-in"); val out = tmp("rdb-tk-out"); val ckpt = tmp("rdb-tk-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      def start() = StreamingOps
        .trackSegmentStream(spark.readStream.schema(schema).json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def fix(t: String, eid: Long, lon: Double) =
        s"""{"time":"${t}Z","user_id":7,"event_id":$eid,"lat":1.5,"lon":$lon}"""
      // two January fixes, then stop — the open month lives ONLY in state
      Files.writeString(Paths.get(in, "b1.json"),
        fix("2024-01-05T10:00:00", 102, 10.5) + "\n" +
          fix("2024-01-03T10:00:00", 101, 8.5))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // a February fix after restart must close January WITH both
      // pre-restart fixes, sorted
      Files.writeString(Paths.get(in, "b2.json"), fix("2024-02-01T09:00:00", 103, 12.5))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val segs = spark.read.parquet(out)
        .selectExpr("user_id", "chunk", "n_fixes",
          "transform(seg, f -> f.seq) AS seqs")
        .as[(Long, java.sql.Timestamp, Int, Seq[Long])].collect().toSeq
      assert(segs == Seq((7L, ts("2024-01-01 00:00:00"), 2, Seq(101L, 102L))),
        s"recovered open month diverged: $segs")
    }
  }

  test("zone ledgers + restart: the held interval settles from the RocksDB-recovered frontier") {
    withRocksDb {
      val in = tmp("rdb-zl-in"); val ckpt = tmp("rdb-zl-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      val zones = graft.operators.Queries.ZoneDefs.map { case (id, _, vs) => (id, vs) }
      // parquet sink refuses update mode — collect emissions through
      // foreachBatch (checkpoint-compatible), keeping the newest ledger
      // per zone (counters are monotone)
      val emitted = new scala.collection.concurrent.TrieMap[Long, (Long, Long, Long)]
      def start() = StreamingOps
        .zonesDwellStream(spark.readStream.schema(schema).json(in), zones)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingOps.ZonesDwellRow], _: Long) =>
          b.collect().foreach(r => emitted.updateWith(r.zone_id)(o =>
            Some(Seq(o.getOrElse((0L, 0L, 0L)),
              (r.n_inside_obs, r.dwell_us, r.n_visits)).max)))
          ()
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()
      def fix(t: String, eid: Long, lon: Double) =
        s"""{"time":"${t}Z","user_id":90,"event_id":$eid,"lat":0.5,"lon":$lon}"""
      // one fix inside zones 1+4, then stop — frontier + ledgers live
      // only in state
      Files.writeString(Paths.get(in, "b1.json"), fix("2024-01-01T10:00:00", 180, 0.5))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart, a fix outside every zone 90 min later: the
      // settled 90-min dwell can only come from the recovered frontier
      Files.writeString(Paths.get(in, "b2.json"), fix("2024-01-01T11:30:00", 280, 100.5))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val fin = emitted.toSeq.sortBy(_._1)
      assert(fin == Seq(
        (1L, (1L, 5400000000L, 1L)), (4L, (1L, 5400000000L, 1L))),
        s"recovered ledgers diverged: $fin")
    }
  }

  test("held OD origin + restart: the trip into a post-restart visit cites the recovered origin") {
    withRocksDb {
      val in = tmp("rdb-od-in"); val out = tmp("rdb-od-out"); val ckpt = tmp("rdb-od-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      def start() = StreamingOps
        .odFlowStream(spark.readStream.schema(schema).json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def fix(t: String, eid: Long, lon: Double) =
        s"""{"time":"${t}Z","user_id":97,"event_id":$eid,"lat":7.5,"lon":$lon}"""
      // before the stop: visit V1 closes into visit V2 (one trip
      // emits), V2 closes at a lone wander fix — V2 is now the HELD
      // ORIGIN, living only in state
      Files.writeString(Paths.get(in, "b1.json"), Seq(
        fix("2024-01-01T00:00:00", 180, 0.5),
        fix("2024-01-01T13:00:00", 181, 1.5),
        fix("2024-01-02T00:00:00", 240, 60.5),
        fix("2024-01-02T12:00:00", 241, 61.5),
        fix("2024-01-03T00:00:00", 310, 130.5)).mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart: a February visit closes in March — its trip's
      // origin cell and dwell can only come from the recovered V2
      Files.writeString(Paths.get(in, "b2.json"), Seq(
        fix("2024-02-01T00:00:00", 540, 0.5),
        fix("2024-02-01T13:00:00", 541, 1.5),
        fix("2024-03-01T00:00:00", 670, 130.5)).mkString("\n"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val trips = spark.read.parquet(out)
        .selectExpr("t_depart", "o_cell_lat", "o_cell_lon", "d_cell_lat",
          "d_cell_lon", "origin_dwell_us")
        .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1.getTime).toSeq
      assert(trips == Seq(
        (ts("2024-01-01 13:00:00"), 0L, 0L, 0L, 6L, 13L * 3600000000L),
        (ts("2024-01-02 12:00:00"), 0L, 6L, 0L, 0L, 12L * 3600000000L)),
        s"recovered origin diverged: $trips")
    }
  }

  test("zone containment set + restart: the exit emits from the RocksDB-held set") {
    withRocksDb {
      val in = tmp("rdb-zn-in"); val out = tmp("rdb-zn-out"); val ckpt = tmp("rdb-zn-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      val zones = graft.operators.Queries.ZoneDefs.map { case (id, _, vs) => (id, vs) }
      def start() = StreamingOps
        .geoZonesStream(spark.readStream.schema(schema).json(in), zones)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def fix(t: String, eid: Long, lon: Double) =
        s"""{"time":"${t}Z","user_id":100,"event_id":$eid,"lat":10.5,"lon":$lon}"""
      // enter zone 1 before the stop
      Files.writeString(Paths.get(in, "b1.json"), fix("2024-01-01T10:00:00", 139, -40.5))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart, a fix outside every zone: the exit row can only
      // come from the recovered containment set
      Files.writeString(Paths.get(in, "b2.json"), fix("2024-01-01T11:00:00", 280, 100.5))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val log = spark.read.parquet(out)
        .selectExpr("event_id", "zone_id", "event")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(log == Seq((139L, 1L, "enter"), (280L, 1L, "exit")),
        s"recovered zone set diverged: $log")
    }
  }

  test("convoy pair state + restart: the episode closes from the RocksDB-recovered ledger and run") {
    withRocksDb {
      val in = tmp("rdb-cv-in"); val out = tmp("rdb-cv-out"); val ckpt = tmp("rdb-cv-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time_a TIMESTAMP, user_a LONG, event_a LONG, " +
          "time_b TIMESTAMP, user_b LONG, event_b LONG, d2 DOUBLE, dt_us LONG")
      def start() = {
        import spark.implicits._
        StreamingOps.convoysStream(
          spark.readStream.schema(schema).json(in)
            .as[graft.streaming.StreamingOps.ContactEvent])
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
      }
      def ce(ta: String, ua: Long, ea: Long, tb: String, ub: Long, eb: Long) =
        s"""{"time_a":"${ta}Z","user_a":$ua,"event_a":$ea,""" +
          s""""time_b":"${tb}Z","user_b":$ub,"event_b":$eb,"d2":8.0,"dt_us":0}"""
      // hours 10 and 11 land in state, then the query STOPS — the pend
      // ledger and frontier survive only in RocksDB
      Files.writeString(Paths.get(in, "b1.json"), Seq(
        ce("2024-01-01T10:15:00", 10L, 180L, "2024-01-01T10:15:00", 12L, 182L),
        ce("2024-01-01T11:20:00", 10L, 184L, "2024-01-01T11:20:00", 12L, 186L))
        .mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart: hour 12 completes the 3-hour run, and a far pair
      // advances the watermark past the (10,12) timeout
      Files.writeString(Paths.get(in, "b2.json"), Seq(
        ce("2024-01-01T12:05:00", 10L, 188L, "2024-01-01T12:05:00", 12L, 190L),
        ce("2024-01-05T10:00:00", 50L, 300L, "2024-01-05T10:00:00", 51L, 302L))
        .mkString("\n"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      // one more batch lets the timeout FIRE against the advanced
      // watermark — the emitted episode can only assemble from the
      // recovered hours 10–11 plus the post-restart hour 12
      Files.writeString(Paths.get(in, "b3.json"),
        ce("2024-01-06T10:00:00", 50L, 304L, "2024-01-06T10:00:00", 51L, 306L))
      val q3 = start(); q3.processAllAvailable(); q3.stop()
      val got = spark.read.parquet(out)
        .selectExpr("id_lo", "id_hi", "hr_start", "n_hours", "n_contacts",
          "CAST(first_contact AS STRING)", "CAST(last_contact AS STRING)")
        .as[(Long, Long, Long, Long, Long, String, String)].collect().toSeq
      val hr10 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00").getTime / 3600000L
      assert(got == Seq((10L, 12L, hr10, 3L, 3L,
        "2024-01-01 10:15:00", "2024-01-01 12:05:00")),
        s"recovered convoy episode diverged: $got")
    }
  }

  test("contact cell state + restart: an out-of-order partner pairs from RocksDB-recovered held fixes") {
    withRocksDb {
      val in = tmp("rdb-ct-in"); val out = tmp("rdb-ct-out"); val ckpt = tmp("rdb-ct-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      def start() = StreamingOps
        .contactsStream(spark.readStream.schema(schema).json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def fix(t: String, uid: Long, eid: Long) = {
        val lat = (uid % 180 - 90).toDouble + 0.5
        val lon = (eid % 360 - 180).toDouble + 0.5
        s"""{"time":"${t}Z","user_id":$uid,"event_id":$eid,"lat":$lat,"lon":$lon}"""
      }
      // the 11:30 fix lands in state alone, then the query STOPS — the
      // held cell fixes and frontier survive only in RocksDB
      Files.writeString(Paths.get(in, "b1.json"), fix("2024-01-01T11:30:00", 12L, 182L))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart its OUT-OF-ORDER partner (10:00, inside the 2 h
      // horizon) arrives: the pair can only form from recovered state
      Files.writeString(Paths.get(in, "b2.json"), fix("2024-01-01T10:00:00", 10L, 180L))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      val got = spark.read.parquet(out)
        .selectExpr("user_a", "event_a", "user_b", "event_b", "d2", "dt_us")
        .as[(Long, Long, Long, Long, Double, Long)].collect().toSeq
      assert(got == Seq((10L, 180L, 12L, 182L, 8.0, 5400000000L)),
        s"recovered-state pairing diverged: $got")
      val confLines = new String(Files.readAllBytes(
        Paths.get(ckpt, "offsets", "0")), "UTF-8")
      assert(confLines.contains("RocksDBStateStoreProvider"),
        s"checkpoint does not record the RocksDB provider: $confLines")
    }
  }

  test("contact-cell panel counters + restart: the window closes from RocksDB-recovered counts and user set") {
    withRocksDb {
      val in = tmp("rdb-cp-in"); val out = tmp("rdb-cp-out"); val ckpt = tmp("rdb-cp-ckpt")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "time TIMESTAMP, user_id LONG, event_id LONG, lat DOUBLE, lon DOUBLE")
      def start() = StreamingOps
        .contactCellsStream(spark.readStream.schema(schema).json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      def fix(t: String, uid: Long, eid: Long) = {
        val lat = (uid % 180 - 90).toDouble + 0.5
        val lon = (eid % 360 - 180).toDouble + 0.5
        s"""{"time":"${t}Z","user_id":$uid,"event_id":$eid,"lat":$lat,"lon":$lon}"""
      }
      // two home fixes land in the cell-window's counters, then the
      // query STOPS — ek/k and the user set survive only in RocksDB
      Files.writeString(Paths.get(in, "b1.json"), Seq(
        fix("2024-01-01T10:00:00", 10L, 180L),
        fix("2024-01-01T10:30:00", 12L, 181L)).mkString("\n"))
      val q1 = start(); q1.processAllAvailable(); q1.stop()
      // after restart a THIRD entity joins the same window, and a far
      // sentinel advances the watermark past the window close
      Files.writeString(Paths.get(in, "b2.json"), Seq(
        fix("2024-01-01T11:00:00", 14L, 182L),
        fix("2024-02-01T00:00:00", 100L, 90L)).mkString("\n"))
      val q2 = start(); q2.processAllAvailable(); q2.stop()
      // one more batch fires the event-time timeout: the emitted panel
      // row can only assemble from the recovered counters + user set
      Files.writeString(Paths.get(in, "b3.json"),
        fix("2024-02-01T00:30:00", 100L, 90L))
      val q3 = start(); q3.processAllAvailable(); q3.stop()
      val got = spark.read.parquet(out)
        .selectExpr("tb", "cx", "cy", "n_fixes", "n_users",
          "n_pairs_within", "n_candidates")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
      val tb = ts("2024-01-01 10:00:00").getTime * 1000L / 7200000000L
      // k = 3 home fixes across the restart, 3 distinct users, pair
      // bound 3, ek = 3 (no neighbor-cell contributors) -> candidates 9
      assert(got == Seq((tb, 1L, 22L, 3L, 3L, 3L, 9L)),
        s"recovered panel row diverged: $got")
    }
  }
}
