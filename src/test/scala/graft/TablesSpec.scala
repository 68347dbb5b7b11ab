package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the loader contract the round-9 fixture regeneration broke: no
  * matter which physical timestamp form the fixture writer chose (ns
  * int64, µs NTZ, µs TZ), every table loads with TimestampType time
  * columns, so `unix_micros`-based operators always analyze. */
class TablesSpec extends SparkSpec {

  test("fixture timestamp columns normalize to TimestampType on read") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ts = Tables.events(spark, s"/root/testdata/$sf").schema("ts").dataType
      assert(ts == TimestampType, s"$sf events.ts loaded as $ts")
    }
    val o = Tables.orders(spark, "/root/testdata/sf0.001").schema
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001").schema
    for (f <- o.fields ++ l.fields)
      assert(!f.dataType.isInstanceOf[TimestampNTZType],
        s"${f.name} still TIMESTAMP_NTZ after load")
  }
}
