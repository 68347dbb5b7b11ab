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
}
