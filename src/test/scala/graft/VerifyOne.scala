package graft

/** Focused Verify: dump ONLY the named queries (plus oracle_sql.json) so
  * a single oracle row can be iterated without the full 75-query sweep.
  * Usage: runMain graft.VerifyOne <sfDir> <outDir> <query> [query ...]
  * then: python3 scripts/selfcheck.py <sfDir> <outDir> <query> ...
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSet)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    def ntz(df: org.apache.spark.sql.DataFrame) =
      df.select(df.schema.fields.map { f =>
        if (f.dataType == TimestampType) col(f.name).cast("timestamp_ntz").as(f.name)
        else col(f.name)
      }.toSeq: _*)
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      ntz(fn(spark, sfDir)).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
