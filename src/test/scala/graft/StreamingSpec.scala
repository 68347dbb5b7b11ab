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

  test("jdbc sink: non-transient failure drops batch; retry path bounded") {
    // no database in the container: a bogus jdbc URL must not throw —
    // the reference's log-and-drop path (__init__.py:229-235)
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("entity_id", "v")
    var slept = 0L
    LtssSink.writeJdbc(df, LtssConfig(dbUrl = "jdbc:invalid://nowhere"),
      maxRetries = 2, retryWaitMs = 1, sleep = ms => slept += ms)
    succeed
  }
}
