package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.config.{FilterSpec, LtssConfig}
import graft.sources.LtssSink
import graft.streaming.StreamingIngest

/** End-to-end streaming lifecycle (the bats-test analog, SURVEY.md §5):
  * JSON event files → filter/project → chunked parquet sink → drain →
  * assert stored rows, schema, and partition layout. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("ingest stream: events → filters → chunked parquet, graceful drain") {
    val in = tmp("ltss-in")
    val out = tmp("ltss-out")
    val ckpt = tmp("ltss-ckpt")
    val events =
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000001Z","user_id":1,"event_type":"sensor","value":21.5,"props":"{\"latitude\": 1.5, \"longitude\": 2.5}"}
        |{"event_id":2,"ts":"2024-02-15T00:00:00.000001Z","user_id":2,"event_type":"sensor","value":7.25,"props":"{\"k\": 3}"}
        |{"event_id":3,"ts":"2024-01-02T00:00:00.000001Z","user_id":3,"event_type":"noise","value":1.0,"props":"{}"}
        |{"event_id":4,"ts":"2024-01-03T00:00:00.000001Z","user_id":4,"event_type":"sensor","value":null,"props":"{}"}
        |""".stripMargin
    Files.writeString(java.nio.file.Paths.get(in, "batch1.json"), events)

    val cfg = LtssConfig(
      include = FilterSpec(domains = Seq("sensor")),
      enableLocation = true)
    val q = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt)
    StreamingIngest.drainAndStop(q)

    val stored = spark.read.parquet(out)
    // event 3 fails the entity filter; event 4 has null value → state "null"?
    // no: null value → format_string yields null → validity drops it
    val rows = stored.orderBy("entity_id").collect()
    assert(rows.map(_.getAs[String]("entity_id")).toSeq == Seq("sensor.1", "sensor.2"))
    // chunk partition dirs exist (time-partitioned layout ≙ hypertable chunks)
    val chunks = new java.io.File(out).listFiles().filter(_.getName.startsWith("chunk="))
    assert(chunks.length == 2) // Jan + Feb chunks (30-day buckets)
    // location extracted for event 1
    val r1 = stored.filter(col("entity_id") === "sensor.1").head()
    assert(r1.getAs[org.apache.spark.sql.Row]("location").getDouble(0) == 2.5)
    val r2 = stored.filter(col("entity_id") === "sensor.2").head()
    assert(r2.getAs[org.apache.spark.sql.Row]("location") == null)
  }

  test("ingest stream materializes configured attribute keys as typed columns (GIN analog)") {
    import spark.implicits._
    val in = tmp("ltss-in-ak"); val out = tmp("ltss-out-ak"); val ckpt = tmp("ltss-ckpt-ak")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.0,"props":"{\"k\": 95}"}
        |{"event_id":2,"ts":"2024-01-01T00:00:01Z","user_id":2,"event_type":"a","value":2.0,"props":"{\"k\": 10}"}
        |{"event_id":3,"ts":"2024-01-01T00:00:02Z","user_id":3,"event_type":"a","value":3.0,"props":"{}"}
        |""".stripMargin)
    val cfg = LtssConfig(enableLocation = false)
    val q = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt,
      attrKeys = Seq("k" -> "long"))
    StreamingIngest.drainAndStop(q)
    val stored = spark.read.parquet(out)
    assert(stored.columns.contains("attr_k"))
    // typed column round-trips; absent key → null; predicate answers
    // without re-parsing JSON
    assert(stored.filter(col("attr_k") >= 90).select("entity_id").as[String].collect().toSeq
      == Seq("a.1"))
    assert(stored.filter(col("attr_k").isNull).count() == 1)
    // the marker records the key set, so a mismatched later batch fails loudly
    assert(graft.sources.LtssSink.readLayoutMarker(spark, out).get.attrKeys
      == Seq("k" -> "long"))
  }

  test("restart with CHANGED attrKeys fails the stream loudly mid-stream, landing nothing") {
    import spark.implicits._
    val in = tmp("ltss-in-ak2"); val out = tmp("ltss-out-ak2"); val ckpt = tmp("ltss-ckpt-ak2")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.0,"props":"{\"k\": 5}"}""")
    val cfg = LtssConfig(enableLocation = false)
    val q1 = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt,
      attrKeys = Seq("k" -> "long"))
    StreamingIngest.drainAndStop(q1)
    assert(spark.read.parquet(out).count() == 1)

    // new input + restart with a DIFFERENT materialized key set: the
    // layout marker guard must fail the QUERY (foreachBatch rethrows →
    // the checkpoint does not advance), not silently mix schemas
    Files.writeString(java.nio.file.Paths.get(in, "b2.json"),
      """{"event_id":2,"ts":"2024-01-01T00:00:01Z","user_id":2,"event_type":"a","value":2.0,"props":"{\"j\": 7}"}""")
    val q2 = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt,
      attrKeys = Seq("j" -> "long"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingIngest.drainAndStop(q2)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("materializes attribute keys")),
      s"expected the marker guard's message; got: ${messages(e)}")
    // nothing from the failed batch landed; the layout still has the
    // original key set and the original row only
    val stored = spark.read.parquet(out)
    assert(stored.count() == 1)
    assert(stored.filter(col("attr_k") === 5).count() == 1)
    assert(LtssSink.readLayoutMarker(spark, out).get.attrKeys == Seq("k" -> "long"))
  }

  test("restart with same checkpoint does not duplicate processed input") {
    val in = tmp("ltss-in2"); val out = tmp("ltss-out2"); val ckpt = tmp("ltss-ckpt2")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.0,"props":"{}"}""")
    val cfg = LtssConfig()
    val q1 = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt)
    StreamingIngest.drainAndStop(q1)
    val q2 = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, out, ckpt)
    StreamingIngest.drainAndStop(q2)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("jdbc sink: non-transient failure rethrows by default, drops only on opt-in") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("entity_id", "v")
    val cfg = LtssConfig(dbUrl = "jdbc:invalid://nowhere")
    // default: rethrow, so a streaming checkpoint can't advance past loss
    assertThrows[Exception] {
      LtssSink.writeJdbc(df, cfg, maxRetries = 2, retryWaitMs = 1, sleep = _ => ())
    }
    // opt-in: the reference's log-and-drop path (__init__.py:229-235)
    LtssSink.writeJdbc(df, cfg, maxRetries = 2, retryWaitMs = 1, sleep = _ => (),
      dropOnFailure = true)
    succeed
  }

  test("jdbc bootstrap creates the ltss table with PK, idempotently; writes append (D1)") {
    val url = s"jdbc:derby:memory:graftd1_${System.nanoTime()};create=true"
    val cfg = LtssConfig(dbUrl = url, enableLocation = true)
    // Derby defaults resolve to CLOB columns (Spark's Derby dialect binds
    // NULL strings as CLOB, which Derby refuses to coerce into VARCHAR)
    LtssSink.bootstrapJdbc(cfg) // creates
    LtssSink.bootstrapJdbc(cfg) // introspects, skips — must not throw
    import spark.implicits._
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "sensor.1", "1.00", """{"k":1}""", null: String),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "sensor.2", "2.00", """{"k":2}""", null: String))
      .toDF("time", "entity_id", "state", "attributes", "location")
    LtssSink.writeJdbc(rows, cfg, retryWaitMs = 1)
    val back = spark.read.jdbc(url, "ltss", new java.util.Properties())
    assert(back.count() == 2)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("time", "entity_id", "state", "attributes", "location"))
    // PK (time, entity_id) is enforced; a replayed batch's duplicate
    // insert is classified as a conflict, the already-committed keys are
    // anti-joined away, and the (empty) remainder retried — no throw,
    // no duplicate rows (reference drop-on-PK-conflict, __init__.py:229-231)
    LtssSink.writeJdbc(rows, cfg, maxRetries = 1, retryWaitMs = 1, sleep = _ => ())
    assert(spark.read.jdbc(url, "ltss", new java.util.Properties()).count() == 2)
  }

  test("jdbc bootstrap: bounded connect-retry then readiness / give-up (L1)") {
    var attempts = 0
    var slept = 0L
    def flaky(failures: Int): String => java.sql.Connection = { url =>
      attempts += 1
      if (attempts <= failures) throw new java.sql.SQLTransientConnectionException("down")
      java.sql.DriverManager.getConnection(url)
    }
    val url = s"jdbc:derby:memory:graftl1_${System.nanoTime()};create=true"
    // recovers after 2 failures → ready
    LtssSink.bootstrapJdbc(LtssConfig(dbUrl = url), retryWaitMs = 3,
      sleep = ms => slept += ms, connect = flaky(2))
    assert(attempts == 3 && slept == 6)
    // never recovers → throws the last connect error after maxRetries
    attempts = 0; slept = 0
    assertThrows[java.sql.SQLException] {
      LtssSink.bootstrapJdbc(LtssConfig(dbUrl = url), maxRetries = 4, retryWaitMs = 3,
        sleep = ms => slept += ms, connect = _ => throw new java.sql.SQLTransientConnectionException("down"))
    }
    assert(slept == 9) // maxRetries-1 waits, like the reference's loop
  }

  test("end-to-end: stream → bootstrap → JDBC sink lands rows in the database") {
    val in = tmp("ltss-in4"); val ckpt = tmp("ltss-ckpt4")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.5,"props":"{\"k\": 1}"}
        |{"event_id":2,"ts":"2024-01-01T00:00:01Z","user_id":2,"event_type":"a","value":2.5,"props":"{\"k\": 2}"}
        |""".stripMargin)
    val url = s"jdbc:derby:memory:grafte2e_${System.nanoTime()};create=true"
    val cfg = LtssConfig(dbUrl = url, enableLocation = false)
    val q = StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, "", ckpt)
    StreamingIngest.drainAndStop(q)
    val back = spark.read.jdbc(url, "ltss", new java.util.Properties())
    assert(back.count() == 2)
    assert(back.select("entity_id").collect().map(_.getString(0)).sorted.toSeq == Seq("a.1", "a.2"))
  }

  test("sink failure fails the streaming query — checkpoint cannot advance past loss") {
    val in = tmp("ltss-in5"); val ckpt = tmp("ltss-ckpt5")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.0,"props":"{}"}""")
    // unreachable JDBC target, but a registered driver scheme (derby URL
    // with no create → connect fails): bootstrap gives up by THROWING,
    // before any stream starts — the readiness contract (L1)
    val cfg = LtssConfig(dbUrl = "jdbc:derby:memory:absent_db_no_create")
    assertThrows[java.sql.SQLException] {
      StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, "", ckpt)
    }
  }

  test("locationToWkt renders the struct as the reference's WKT wire format (models.py:61)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, lit, when}
    val df = Seq((1, Some((11.97, 57.7))), (2, None)).toDF("id", "raw")
      .withColumn("location",
        when(col("raw").isNotNull,
          struct(col("raw._1").as("lon"), col("raw._2").as("lat"))))
      .drop("raw")
    val out = LtssSink.locationToWkt(df).orderBy("id")
      .select("location").as[String].collect().toSeq
    assert(out == Seq("SRID=4326;POINT(11.97 57.7)", null))
    // string/absent location columns pass through untouched
    assert(LtssSink.locationToWkt(df.drop("location")).columns.toSeq == Seq("id"))
  }

  test("stream drops rows with non-JSON attributes, keeps the rest (P4, __init__.py:212-216)") {
    val in = tmp("ltss-in3"); val out = tmp("ltss-out3"); val ckpt = tmp("ltss-ckpt3")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"a","value":1.0,"props":"{\"k\": 1}"}
        |{"event_id":2,"ts":"2024-01-01T00:00:01Z","user_id":2,"event_type":"a","value":2.0,"props":"not json"}
        |{"event_id":3,"ts":"2024-01-01T00:00:02Z","user_id":3,"event_type":"a","value":3.0,"props":"{\"k\": "}
        |""".stripMargin)
    val q = StreamingIngest.start(
      StreamingIngest.readJsonEvents(spark, in), LtssConfig(enableLocation = false), out, ckpt)
    StreamingIngest.drainAndStop(q)
    val stored = spark.read.parquet(out)
    assert(stored.select("entity_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("a.1"))
  }
}
