package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.config.{EventSource, FilterSpec, LtssConfig}
import graft.streaming.StreamingIngest

/** The Kafka record shape the connector emits (public contract of the
  * spark-sql-kafka source): the spec feeds it through MemoryStream so
  * the decode + downstream chain is pinned without a broker. */
final case class KafkaWire(
    key: Array[Byte],
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: java.sql.Timestamp,
    timestampType: Int)

/** S1's production guise: config-selected Kafka source. The sandbox has
  * no Kafka connector jar and no broker, so the seam is tested the way
  * it is designed: (1) the config parses and routes to the kafka
  * format (asserted by the source-registry error naming it), and
  * (2) the value-decode plus the ENTIRE downstream
  * filter/project/sink chain — everything below the readStream leaf —
  * runs against MemoryStream records in the connector's wire shape and
  * lands byte-identical rows to the JSON-directory guise. */
class KafkaGuiseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("event_source config: kafka and json_dir guises parse, junk rejected") {
    val kafka = LtssConfig.fromMap(Map(
      "db_url" -> "jdbc:postgresql://db/ltss",
      "event_source" -> Map(
        "type" -> "kafka",
        "bootstrap_servers" -> "broker-1:9092,broker-2:9092",
        "topic" -> "ha-events",
        "starting_offsets" -> "earliest",
        "max_offsets_per_trigger" -> 100000)))
    assert(kafka.eventSource.contains(EventSource.Kafka(
      "broker-1:9092,broker-2:9092", "ha-events", "earliest", Some(100000L))))
    val dir = LtssConfig.fromMap(Map(
      "db_url" -> "jdbc:postgresql://db/ltss",
      "event_source" -> Map("type" -> "json_dir", "path" -> "/data/events")))
    assert(dir.eventSource.contains(EventSource.JsonDir("/data/events", 16)))
    // strictness matches the rest of CONFIG_SCHEMA: unknown keys and
    // unknown types are errors, not silent ignores
    intercept[IllegalArgumentException](LtssConfig.fromMap(Map(
      "db_url" -> "x",
      "event_source" -> Map("type" -> "kafka", "topic" -> "t",
        "bootstrap_servers" -> "b", "zookeeper" -> "legacy"))))
    intercept[IllegalArgumentException](LtssConfig.fromMap(Map(
      "db_url" -> "x", "event_source" -> Map("type" -> "rabbitmq"))))
    intercept[IllegalArgumentException](LtssConfig.fromMap(Map(
      "db_url" -> "x", "event_source" -> Map("type" -> "kafka", "topic" -> "t"))))
  }

  test("readEvents(Kafka) routes to the kafka source format") {
    // no connector jar ships in this zero-egress sandbox; the lookup
    // failure NAMING the kafka format is exactly the proof that the
    // config-selected branch wires format("kafka") rather than
    // something else quietly succeeding
    val e = intercept[Exception] {
      StreamingIngest.readEvents(spark,
        EventSource.Kafka("broker:9092", "ha-events"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), s"error does not name kafka: $e")
  }

  test("startFromConfig drives the whole ingest from the config map alone") {
    val in = tmp("kg-cfg-in"); val out = tmp("kg-cfg-out"); val ckpt = tmp("kg-cfg-ckpt")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"),
      """{"event_id":1,"ts":"2024-01-01T00:00:00Z","user_id":1,"event_type":"sensor","value":2.5,"props":"{}"}""" + "\n")
    val cfg = LtssConfig.fromMap(Map(
      "db_url" -> "unused:parquet-sink",
      "include" -> Map("domains" -> Seq("sensor")),
      "event_source" -> Map("type" -> "json_dir", "path" -> in,
        "max_files_per_trigger" -> 4)))
    StreamingIngest.drainAndStop(
      StreamingIngest.startFromConfig(spark, cfg, out, ckpt))
    assert(spark.read.parquet(out).count() == 1)
    // no event_source section -> loud, with the fix named
    val bare = LtssConfig(dbUrl = "x")
    val e = intercept[IllegalArgumentException](
      StreamingIngest.startFromConfig(spark, bare, out, ckpt))
    assert(e.getMessage.contains("event_source"))
  }

  test("kafka broker e2e, or the environment proven unable by an executed search") {
    // The PgTestServer convention, applied to Kafka: ATTEMPT the real
    // thing and turn an unavailable environment into an executed,
    // documented Left(reason) — not an untested assumption. Two
    // artifacts are required for a broker-level e2e: the
    // spark-sql-kafka-0-10 connector (client side) and a Kafka broker
    // distribution (kafka.Kafka / KRaft server classes). Search every
    // artifact root this sandbox has, then drive format("kafka") for
    // real so the failure mode on record is the loader's, not a guess.
    val home = sys.props.getOrElse("user.home", "/root")
    val roots = Seq("/opt/spark/jars", s"$home/.ivy2", s"$home/.cache/coursier",
      s"$home/.m2", "/opt/kafka", "/usr/share/java")
    def kafkaJars(root: String): Seq[String] = {
      // walkFileTree with visitFileFailed=CONTINUE: an unreadable subdir
      // or dangling symlink under ~/.ivy2 etc. must read as "no jars
      // there", not blow up the environment probe into a test error
      import java.nio.file.{FileVisitResult, Files, Path, Paths, SimpleFileVisitor}
      import java.nio.file.attribute.BasicFileAttributes
      val p = Paths.get(root)
      if (!Files.isDirectory(p)) Nil
      else {
        val acc = scala.collection.mutable.ListBuffer.empty[String]
        scala.util.Try(Files.walkFileTree(p, new SimpleFileVisitor[Path] {
          override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
            val n = f.toString
            if (n.endsWith(".jar") &&
                n.substring(n.lastIndexOf('/') + 1).toLowerCase.contains("kafka"))
              acc += n
            FileVisitResult.CONTINUE
          }
          override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
            FileVisitResult.CONTINUE
        }))
        acc.toList
      }
    }
    val found = roots.flatMap(kafkaJars)
    val connector = found.filter(_.contains("spark-sql-kafka"))
    val broker = found.filter(f => f.contains("kafka_2.") || f.contains("kafka-server"))
    if (connector.isEmpty || broker.isEmpty) {
      // prove the load path is really absent: the connector lookup must
      // fail AT THE SOURCE REGISTRY, naming kafka — the same seam the
      // routing test pins, now exercised as the documented Left branch
      val e = intercept[Exception] {
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", "127.0.0.1:1")
          .option("subscribe", "probe").load()
      }
      assert(e.getMessage.toLowerCase.contains("kafka"),
        s"loader failed for a different reason than a missing connector: $e")
      cancel(
        s"kafka broker e2e unavailable here: searched ${roots.mkString(", ")}; " +
          s"kafka-named jars found: ${if (found.isEmpty) "none" else found.mkString(", ")}; " +
          s"connector=${connector.size} broker=${broker.size}; " +
          s"format(\"kafka\").load() failed with ${e.getClass.getSimpleName}: " +
          e.getMessage.takeWhile(_ != '\n'))
    } else {
      // both artifacts present: this sandbox can run the real thing —
      // cancel LOUDLY (not fail: a well-provisioned machine is an
      // environment fact, not a code defect) so the e2e gets written
      cancel(s"kafka broker e2e NOW IMPLEMENTABLE (connector=$connector " +
        s"broker=$broker): write the e2e (KRaft single node, produce → " +
        "readEvents(Kafka) → shared chain) and replace this probe")
    }
  }

  test("kafka value decode + unchanged downstream chain lands the JSON-dir guise's rows") {
    val events = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:00:00.000001Z","user_id":1,"event_type":"sensor","value":21.5,"props":"{\"latitude\": 1.5, \"longitude\": 2.5}"}""",
      """{"event_id":2,"ts":"2024-02-15T00:00:00.000001Z","user_id":2,"event_type":"sensor","value":7.25,"props":"{\"k\": 3}"}""",
      """{"event_id":3,"ts":"2024-01-02T00:00:00.000001Z","user_id":3,"event_type":"noise","value":1.0,"props":"{}"}""",
      """not json at all""") // connector delivers opaque bytes; decode must null-row it, not die
    val cfg = LtssConfig(include = FilterSpec(domains = Seq("sensor")), enableLocation = true)

    // guise A: the JSON-directory source
    val in = tmp("kg-in"); val outA = tmp("kg-out-a"); val ckptA = tmp("kg-ckpt-a")
    Files.writeString(java.nio.file.Paths.get(in, "b1.json"), events.mkString("", "\n", "\n"))
    StreamingIngest.drainAndStop(
      StreamingIngest.start(StreamingIngest.readJsonEvents(spark, in), cfg, outA, ckptA))

    // guise B: the same payloads as Kafka wire records through the
    // SAME decode the kafka branch of readEvents applies
    val outB = tmp("kg-out-b"); val ckptB = tmp("kg-ckpt-b")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KafkaWire]
    ms.addData(events.zipWithIndex.map { case (v, i) =>
      KafkaWire(null, v.getBytes("UTF-8"), "ha-events", i % 2, i.toLong,
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), 0)
    })
    StreamingIngest.drainAndStop(
      StreamingIngest.start(
        StreamingIngest.decodeKafkaRecords(ms.toDF()), cfg, outB, ckptB))

    val a = spark.read.parquet(outA).orderBy("entity_id")
      .collect().map(_.toString).toSeq
    val b = spark.read.parquet(outB).orderBy("entity_id")
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty, "fixture produced no rows — the parity check would be vacuous")
    assert(a == b, s"guise divergence:\n dir=$a\n kafka=$b")
  }
}
