package graft

import java.sql.{Connection, DatabaseMetaData, ResultSet, SQLException, Statement}
import java.lang.reflect.Proxy
import org.scalatest.funsuite.AnyFunSuite
import graft.config.LtssConfig
import graft.sources.LtssSink

/** The reference's EXTENSION-ADAPTIVE DDL path (__init__.py:257-344),
  * pinned statement-by-statement against a scripted PostgreSQL catalog.
  *
  * The sandbox's PostgreSQL 15 ships NEITHER timescaledb NOR postgis
  * (PostgresE2ESpec records the executed `pg_available_extensions`
  * probe), so the positive branches — `CREATE EXTENSION`, the
  * `geometry(Point,4326)` column, `create_hypertable`,
  * `set_chunk_time_interval` — cannot execute on a live server here.
  * This spec drives [[LtssSink.bootstrapJdbc]]'s injectable `connect`
  * with a reflective fake that answers the exact catalog probes the
  * real path issues and records every statement, so the DDL SEQUENCE
  * and its adaptivity are proven even where the extensions aren't
  * installable. The negative/fallback halves run for real in
  * PostgresE2ESpec. */
class TimescaleDdlSpec extends AnyFunSuite {

  /** Scripted catalog: what the fake server claims to have, plus a
    * transcript of everything executed against it. */
  private class FakePg(
      extensions: Seq[String],
      var tableExists: Boolean,
      var hypertable: Boolean,
      columns: Seq[(String, String)] = Nil,
      indexes: Set[String] = Set.empty,
      pkName: String = "ltss_pkey",
      fks: Seq[String] = Nil) {
    val url = "jdbc:postgresql://scripted-catalog/db"
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]

    private def proxy[T](clazz: Class[T])(
        handler: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
      Proxy.newProxyInstance(clazz.getClassLoader, Array[Class[_]](clazz),
        (_, m, rawArgs) => {
          val args = if (rawArgs == null) Array.empty[AnyRef] else rawArgs
          val key = (m.getName, args)
          if (handler.isDefinedAt(key)) handler(key)
          else m.getName match {
            case "close" | "setAutoCommit" | "commit" | "rollback" => null
            case "isClosed" => java.lang.Boolean.FALSE
            case other => throw new UnsupportedOperationException(
              s"fake ${clazz.getSimpleName} got unexpected call: $other")
          }
        }).asInstanceOf[T]

    private def rs(rows: Seq[String]): ResultSet = {
      var i = -1
      proxy(classOf[ResultSet]) {
        case ("next", _) => i += 1; java.lang.Boolean.valueOf(i < rows.size)
        case ("getString", _) => rows(i)
        case ("close", _) => null
      }
    }

    /** Single-column rows for each probe shape the production paths
      * issue — routed on the same distinguishing substrings. */
    private def queryRows(sql: String): Seq[String] =
      if (sql.contains("pg_available_extensions")) extensions
      else if (sql.contains("information_schema.columns"))
        columns.map { case (c, u) => s"$c:$u" }
      else if (sql.contains("pg_indexes")) indexes.toSeq.sorted
      else if (sql.contains("contype = 'p'")) Seq(pkName)
      else if (sql.contains("contype = 'f'")) fks
      else fail(s"fake catalog got an unrouted query: $sql")

    private def statement(): Statement = proxy(classOf[Statement]) {
      case ("execute", Array(sql: String)) =>
        executed += sql
        if (sql.contains("set_chunk_time_interval") && !hypertable)
          throw new SQLException(s"table is not a hypertable", "42P01")
        if (sql.contains("CREATE TABLE")) tableExists = true
        if (sql.contains("create_hypertable")) hypertable = true
        java.lang.Boolean.FALSE
      case ("executeQuery", Array(sql: String)) =>
        executed += sql
        rs(queryRows(sql))
      case ("close", _) => null
    }

    private val metadata: DatabaseMetaData = proxy(classOf[DatabaseMetaData]) {
      case ("getTables", _) => rs(if (tableExists) Seq("ltss") else Nil)
      case ("getSearchStringEscape", _) => "\\"
    }

    def connect(ignored: String): Connection = proxy(classOf[Connection]) {
      case ("createStatement", _) => statement()
      case ("getMetaData", _) => metadata
      case ("getSchema", _) => "public"
    }

    def ddl: Seq[String] = executed.filterNot(_.trim.toUpperCase.startsWith("SELECT name")).toSeq
  }

  private val legacyColumns = Seq(
    "id" -> "int8", "time" -> "timestamptz", "entity_id" -> "varchar",
    "state" -> "varchar", "attributes" -> "text")

  test("fresh table, PostGIS + TimescaleDB available: the reference DDL sequence in its order") {
    val pg = new FakePg(Seq("postgis", "timescaledb", "plpgsql"),
      tableExists = false, hypertable = false)
    val cfg = LtssConfig(dbUrl = pg.url, chunkTimeIntervalUs = 604800000000L)
    val actions = LtssSink.bootstrapJdbc(cfg, connect = pg.connect)
    assert(actions == Seq("create_extension_postgis", "create_table",
      "attributes_index", "entityid_time_composite_index",
      "create_extension_timescaledb", "create_hypertable", "set_chunk_time_interval"))
    val ddl = pg.executed.filter(s =>
      s.startsWith("CREATE") || s.contains("create_hypertable") ||
        s.contains("set_chunk_time_interval"))
    // __init__.py:319-328 then metadata.create_all (table + its two
    // indexes, models.py:75-80) then :330-344 then :284-290
    assert(ddl(0) == "CREATE EXTENSION IF NOT EXISTS postgis CASCADE")
    assert(ddl(1).startsWith("CREATE TABLE ltss (") &&
      ddl(1).contains("location geometry(Point,4326)") &&
      ddl(1).contains("PRIMARY KEY (time, entity_id)"),
      s"table DDL was: ${ddl(1)}")
    assert(ddl(2) == "CREATE INDEX ltss_attributes_idx ON ltss USING GIN (attributes)")
    assert(ddl(3) == "CREATE INDEX ltss_entityid_time_composite_idx " +
      "ON ltss (entity_id, time DESC)")
    assert(ddl(4) == "CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE")
    assert(ddl(5) == "SELECT create_hypertable('ltss', 'time', if_not_exists => TRUE)")
    assert(ddl(6) == "SELECT set_chunk_time_interval('ltss', 604800000000)")
  }

  test("no extensions available: plain table, WKT-text location, zero extension DDL") {
    val pg = new FakePg(Seq("plpgsql"), tableExists = false, hypertable = false)
    val actions = LtssSink.bootstrapJdbc(LtssConfig(dbUrl = pg.url), connect = pg.connect)
    assert(actions == Seq("create_table", "attributes_index",
      "entityid_time_composite_index"))
    assert(!pg.executed.exists(_.contains("EXTENSION")))
    assert(!pg.executed.exists(_.contains("hypertable")))
    val tbl = pg.executed.find(_.startsWith("CREATE TABLE")).get
    assert(tbl.contains("location VARCHAR(255)"), s"fallback column type: $tbl")
  }

  test("PostGIS available but location disabled: no extension, no column (config gates the reference's auto-activation)") {
    val pg = new FakePg(Seq("postgis"), tableExists = false, hypertable = false)
    val actions = LtssSink.bootstrapJdbc(
      LtssConfig(dbUrl = pg.url, enableLocation = false), connect = pg.connect)
    assert(actions == Seq("create_table", "attributes_index",
      "entityid_time_composite_index"))
    assert(!pg.executed.exists(_.contains("postgis")))
    assert(!pg.executed.find(_.startsWith("CREATE TABLE")).get.contains("location"))
  }

  test("a freshly bootstrapped table has NOTHING pending for the migration ladder") {
    // the ladder exists for LEGACY tables; if bootstrap left a fresh
    // table needing steps, every startup would log phantom migrations
    val pg = new FakePg(Seq("plpgsql"), tableExists = false, hypertable = false,
      columns = Seq("time" -> "timestamptz", "entity_id" -> "varchar",
        "state" -> "varchar", "attributes" -> "jsonb"),
      indexes = Set("ltss_attributes_idx", "ltss_entityid_time_composite_idx"))
    val cfg = LtssConfig(dbUrl = pg.url)
    LtssSink.bootstrapJdbc(cfg, connect = pg.connect)
    assert(LtssSink.checkAndMigrate(cfg, connect = pg.connect, dryRun = true).isEmpty)
  }

  test("legacy PLAIN table under available TimescaleDB: warn-don't-fail, no conversion, migrations run on the plain table (reference order)") {
    val pg = new FakePg(Seq("timescaledb"), tableExists = true, hypertable = false,
      columns = legacyColumns, indexes = Set("ix_ltss_entity_id"))
    val cfg = LtssConfig(dbUrl = pg.url, autoMigrate = true)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    // 1. bootstrap: table exists → no CREATE, and crucially NO
    //    create_hypertable on a table the engine didn't create
    //    (__init__.py only converts at creation); the re-appliable
    //    chunk-interval call hits the not-a-hypertable tolerance
    val actions = LtssSink.bootstrapJdbc(cfg, connect = pg.connect, log = warnings += _)
    assert(actions.isEmpty)
    assert(warnings.exists(_.contains("not a hypertable")),
      s"expected the reference's UndefinedTable warning, got: $warnings")
    // 2. the migration ladder then runs with the table STILL plain —
    //    the reference's check_and_migrate happens after setup with no
    //    hypertable conversion in between (__init__.py:257-312)
    val applied = LtssSink.checkAndMigrate(cfg, connect = pg.connect)
    assert(applied == Seq("attributes_text_to_jsonb", "attributes_index",
      "entityid_time_composite_index", "drop_entityid_index", "remove_id_column"))
    assert(!pg.executed.exists(_.contains("create_hypertable")),
      "the ladder must never convert to a hypertable behind the operator's back")
    // the ladder's DDL comes strictly after every bootstrap statement
    val firstAlter = pg.executed.indexWhere(_.startsWith("ALTER TABLE"))
    val lastBootstrap = pg.executed.lastIndexWhere(_.contains("set_chunk_time_interval"))
    assert(lastBootstrap >= 0 && firstAlter > lastBootstrap)
  }

  test("dry run probes everything, executes nothing, and still names the pending steps") {
    val pg = new FakePg(Seq("plpgsql"), tableExists = true, hypertable = false,
      columns = legacyColumns, indexes = Set("ix_ltss_entity_id"),
      fks = Seq("readings.fk_readings_ltss"))
    val cfg = LtssConfig(dbUrl = pg.url)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val pending = LtssSink.checkAndMigrate(cfg, connect = pg.connect,
      dryRun = true, log = warnings += _)
    assert(pending == Seq("attributes_text_to_jsonb", "attributes_index",
      "entityid_time_composite_index", "drop_entityid_index", "remove_id_column"))
    assert(!pg.executed.exists(s =>
      s.startsWith("ALTER") || s.startsWith("CREATE") || s.startsWith("DROP")),
      s"dry run executed DDL: ${pg.executed.filterNot(_.startsWith("SELECT"))}")
    // the CASCADE visibility contract: the FK that would go down with
    // the PK is named BEFORE anything could drop it
    assert(warnings.exists(w => w.contains("CASCADE") &&
      w.contains("readings.fk_readings_ltss")), s"got: $warnings")
  }

  test("live migration names the cascaded FKs and quotes a renamed table's PK by catalog name") {
    val pg = new FakePg(Seq("plpgsql"), tableExists = true, hypertable = false,
      columns = legacyColumns, indexes = Set(
        "ltss_attributes_idx", "ltss_entityid_time_composite_idx"),
      pkName = "old_name_pkey", fks = Seq("readings.fk_readings_ltss"))
    val cfg = LtssConfig(dbUrl = pg.url)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val applied = LtssSink.checkAndMigrate(cfg, connect = pg.connect, log = warnings += _)
    assert(applied == Seq("attributes_text_to_jsonb", "remove_id_column"))
    val pkSwap = pg.executed.find(_.contains("ADD PRIMARY KEY")).get
    assert(pkSwap.contains("DROP CONSTRAINT IF EXISTS \"old_name_pkey\" CASCADE"),
      s"PK must be dropped by catalog name: $pkSwap")
    assert(warnings.exists(_.contains("readings.fk_readings_ltss")))
  }
}
