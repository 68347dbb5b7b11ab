package graft.sources

import java.sql.{Connection, DriverManager, SQLException}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.config.LtssConfig

/** Batch sinks for LTSS rows.
  *
  * The reference writes one PostgreSQL table, chunked into time partitions
  * by TimescaleDB (`create_hypertable('ltss','time')`, reference
  * __init__.py:337-344, chunk interval __init__.py:284-300). Here the
  * physical design maps to:
  *
  *  - **parquet/lakehouse layout**: `partitionBy(chunk)` where `chunk` is
  *    the time_bucket of the configured chunk interval (default 30 days) —
  *    Catalyst partition-prunes time-range scans exactly like chunk
  *    exclusion; plus `sortWithinPartitions(entity_id, time)` standing in
  *    for the composite `(entity_id, time DESC)` index (models.py:78-80)
  *    via parquet row-group min/max stats.
  *  - **JDBC**: micro-batch appends with per-batch transactions and
  *    bounded retry — strictly better than the reference's one
  *    row-per-transaction loop (__init__.py:207-218).
  */
object LtssSink {

  /** Derived chunk column (partition key), e.g. `chunk=2024-01-01` for a
    * 30-day interval. Pure epoch arithmetic — the UTC day of the chunk
    * start — NOT `to_date` on a timestamp, which renders in the session
    * timezone and would disagree with [[chunkDateOf]]'s pruning bounds
    * on any non-UTC session. */
  def chunkCol(cfg: LtssConfig) = {
    val us = cfg.chunkTimeIntervalUs
    val dayUs = 86400000000L
    val floored = unix_micros(col("time")) - pmod(unix_micros(col("time")), lit(us))
    // exact integer FLOOR division (pmod is non-negative, so subtracting
    // it floors): LONG `div`, never a double `/` — double division loses
    // exactness past 2^53 µs and its cast-to-int truncates toward zero,
    // both of which disagree with chunkDateOf's floorMod arithmetic
    import org.apache.spark.sql.GraftColumns.{columnOf, expressionOf}
    val flooredDay = floored - pmod(floored, lit(dayUs))
    val days = columnOf(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expressionOf(flooredDay), expressionOf(lit(dayUs))))
    date_add(lit(java.sql.Date.valueOf("1970-01-01")), days.cast("int"))
  }

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The shared lifecycle-lock invariant: every surface that reads or
    * mutates a layout (scan, append, retention, compaction) refuses one
    * locked by an in-flight compaction or encoding migration. One
    * definition so the next surface cannot silently miss a guard. */
  private def requireUnlocked(
      marker: Option[LayoutMarker], path: String, before: String): Unit = {
    marker.flatMap(_.compacting).foreach { c =>
      throw new IllegalStateException(
        s"layout at $path has an unfinished compaction of chunk '$c' — " +
          s"run recoverCompaction $before")
    }
    marker.flatMap(_.migrating).foreach { t =>
      throw new IllegalStateException(
        s"layout at $path has an unfinished attributes-encoding migration " +
          s"to '$t' — re-run migrateAttributesEncoding to completion $before")
    }
  }

  /** In-JVM registry of layout paths with a lifecycle mutation IN
    * FLIGHT — the same-process face of the owner-token protocol (two
    * threads of one JVM share a pid, so the pid-liveness probe alone
    * cannot tell a concurrent sibling from this JVM's own crash
    * residue). */
  private val liveLifecycleOps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** This process's lifecycle owner token: `host:pid:nonce`. A marker
    * stamped `<op>:<token>` identifies WHO holds the layout, so a
    * re-entrant runner can tell its predecessor's crash residue (safe
    * to take over — the documented recovery is re-running the
    * operation) from a LIVE concurrent appender (interleaving two
    * stage/retire/swap sequences on the same dirs can lose data). */
  private def ownerToken(): String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    s"$host:${ProcessHandle.current().pid()}:${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** May THIS runner take over a layout whose marker holds `op` residue
    * stamped `residueToken`? Yes iff the stamp is provably not a live
    * concurrent owner: a legacy un-tokened stamp (pre-token vintage —
    * only crash residue survives without a process), a token whose pid
    * on THIS host is no longer alive, or this process's own pid (a
    * prior invocation in this JVM that threw; a live same-JVM sibling
    * is excluded by [[liveLifecycleOps]] before this is consulted). A
    * live pid on this host, or any token from ANOTHER host (no
    * liveness probe is possible across hosts), refuses — the caller
    * passes `force = true` only when the other runner is known dead. */
  private def residueTakeoverAllowed(residueToken: String): Boolean = {
    val parts = residueToken.split(':')
    if (parts.length < 2) return true // legacy un-tokened residue
    val (host, pidStr) = (parts(0), parts(1))
    val self = try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "unknown-host" }
    if (host != self) return false
    scala.util.Try(pidStr.toLong).toOption match {
      case None => true
      case Some(pid) =>
        pid == ProcessHandle.current().pid() ||
          !ProcessHandle.of(pid).map[Boolean](_.isAlive).orElse(false)
    }
  }

  /** Acquire the lifecycle lock for `op` ("appending", "zone-upsert")
    * on the layout at `path`: refuses a same-JVM concurrent holder, a
    * different in-flight operation, and live-owner residue (unless
    * `force`); passes crash residue of the SAME op — recovery there is
    * re-running it. Returns the marker to restamp. The caller MUST
    * release via [[releaseLifecycleLock]] (or by writing the final
    * marker and calling it) in a finally-free happy path — the in-JVM
    * slot is what excludes same-process races. */
  private def acquireLifecycleLock(
      path: String, op: String, marker: LayoutMarker, force: Boolean): Unit = {
    if (!liveLifecycleOps.add(s"$op@$path"))
      throw new IllegalStateException(
        s"a concurrent $op is already running against $path in this process")
    try {
      marker.migrating match {
        case Some(stamp) if stamp == op || stamp.startsWith(s"$op:") =>
          val residue = stamp.stripPrefix(op).stripPrefix(":")
          if (!force && !residueTakeoverAllowed(residue))
            throw new IllegalStateException(
              s"layout at $path is locked by a live $op owner '$residue' — " +
                "wait for it, or pass force=true only if that runner is known dead")
        case _ =>
          requireUnlocked(Some(marker), path, s"before $op")
      }
    } catch {
      case e: Throwable => liveLifecycleOps.remove(s"$op@$path"); throw e
    }
  }

  private def releaseLifecycleLock(path: String, op: String): Unit =
    liveLifecycleOps.remove(s"$op@$path")

  /** Retention: drop whole chunks older than the cutoff — the
    * TimescaleDB `drop_chunks` analog (the retention policy every LTSS
    * deployment pairs with its hypertable). Deletion is partition-dir
    * removal via the Hadoop filesystem (works on HDFS/S3A paths like
    * every other sink API): no scan, no rewrite, O(#dropped chunks)
    * calls. A failed delete THROWS rather than reporting the chunk as
    * dropped. Returns the dropped chunk values.
    *
    * The cutoff floors to the layout marker's RECORDED chunk interval
    * when present, like [[chunkScan]]'s pruning — with a mismatched
    * caller cfg (say 30-day against a 7-day layout) the naive floor can
    * sit far below `olderThan`, and a 7-day chunk lexically below that
    * cutoff may still hold rows INSIDE the retention window: aligned to
    * the true interval, `name < cutoff` implies the whole chunk ends at
    * or before `olderThan`. Refuses a layout locked by an in-flight
    * compaction or encoding migration: deleting a live chunk whose
    * hidden staged/retired copy survives would let the migration's
    * crash recovery RESURRECT the expired rows. */
  def dropChunks(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      olderThan: java.sql.Timestamp,
      cfg: LtssConfig = LtssConfig()): Seq[String] = {
    val (fs, root) = hadoopFs(spark, path)
    if (!fs.exists(root)) return Nil
    val marker = readLayoutMarker(spark, path)
    requireUnlocked(marker, path, "before applying retention")
    val effective = marker
      .map(m => cfg.copy(chunkTimeIntervalUs = m.chunkTimeIntervalUs))
      .getOrElse(cfg)
    val cutoff = chunkDateOf(olderThan, effective).toString
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("chunk="))
      .filter(_.getPath.getName.stripPrefix("chunk=") < cutoff)
      .map { st =>
        if (!fs.delete(st.getPath, true))
          throw new java.io.IOException(s"retention failed to delete ${st.getPath}")
        st.getPath.getName.stripPrefix("chunk=")
      }
      .sorted
  }

  /** Compaction: rewrite one chunk's files into `targetFiles` sorted
    * files (streaming micro-batches leave many small files per chunk;
    * parquet scan efficiency wants few large ones). Chunk-local, like
    * TimescaleDB recompression, so compaction runs incrementally behind
    * ingest. Crash-safe swap: the compacted copy is staged under a
    * DOT-prefixed dir (invisible to partition discovery — readers never
    * see chunk rows twice), the live dir is renamed aside, the staged
    * copy renamed in, and only then is the retired copy deleted — any
    * crash leaves the data recoverable in a hidden dir, never
    * double-counted. A concurrent reader can observe the chunk absent
    * for the instant between the two renames; pair with a table format
    * (Delta/Iceberg) where that window must be zero. */
  def compactChunk(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      chunk: String,
      targetFiles: Int = 1,
      sortCols: Seq[String] = Seq("entity_id", "time")): Unit = {
    val (fs, root) = hadoopFs(spark, path)
    val chunkDir = new org.apache.hadoop.fs.Path(root, s"chunk=$chunk")
    val staged = new org.apache.hadoop.fs.Path(root, s".compact_staged_chunk_$chunk")
    val retired = new org.apache.hadoop.fs.Path(root, s".compact_retired_chunk_$chunk")
    // GENERATION STAMP: before any rename, the layout marker records the
    // in-flight chunk under a bumped generation, so a reader (chunkScan)
    // that arrives while the chunk dir is mid-swap — or after a crash
    // between the two renames — detects the state instead of silently
    // returning a partial layout. Cleared on success;
    // [[recoverCompaction]] repairs any crash point. A marker-less
    // legacy layout compacts unstamped, as before. The in-flight check
    // runs BEFORE the leftover deletes below: when a previous compaction
    // crashed mid-swap, those hidden dirs hold the only surviving copy
    // of the chunk — deleting them here would destroy it.
    val marker = readLayoutMarker(spark, path)
    requireUnlocked(marker, path, "before compacting")
    marker.foreach { m =>
      writeLayoutMarker(spark, path,
        m.copy(generation = m.generation + 1, compacting = Some(chunk)))
    }
    fs.delete(staged, true)
    fs.delete(retired, true)
    spark.read.parquet(chunkDir.toString)
      .repartition(targetFiles)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    if (!fs.rename(chunkDir, retired))
      throw new java.io.IOException(s"compaction could not retire $chunkDir")
    if (!fs.rename(staged, chunkDir))
      throw new java.io.IOException(
        s"compaction could not swap in $staged — original preserved at $retired")
    fs.delete(retired, true)
    marker.foreach(m => writeLayoutMarker(spark, path,
      m.copy(generation = m.generation + 1, compacting = None)))
    ()
  }

  /** Size audit of one [[compactChunkMeasured]] run: parquet file count
    * and bytes before/after the rewrite, plus the applied sort. */
  final case class CompactionAudit(
      chunk: String, sort_cols: Seq[String],
      files_before: Long, bytes_before: Long,
      files_after: Long, bytes_after: Long) {
    /** >1 = the recompression shrank the chunk; NaN when the chunk held
      * no parquet bytes after the rewrite (empty / parquet-less chunk —
      * a real division would poison JSON lifecycle logs with Infinity). */
    def ratio: Double =
      if (bytes_after == 0L) Double.NaN
      else bytes_before.toDouble / bytes_after.toDouble
  }

  /** Parquet file count + bytes under one chunk dir (data files only —
    * markers and hidden staging dirs excluded). */
  private def parquetStats(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): (Long, Long) = {
    val files = fs.listStatus(dir).filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
    (files.length.toLong, files.map(_.getLen).sum)
  }

  /** [[compactChunk]] with the `ltss_compress_plan` recommendation
    * APPLIED AND AUDITED — the action the tuning panel exists to drive
    * (TimescaleDB's `compress_chunk` after setting
    * `compress_segmentby`/`compress_orderby`): rewrite the chunk sorted
    * by the recommended (segmentby, orderby) columns and report parquet
    * bytes before/after. The byte win is real recompression — parquet's
    * RLE/dictionary pages encode the long same-value runs the sorted
    * order creates, the exact mechanism the report's `rle_ratio`
    * predicts — and the audit row is what a lifecycle job logs to prove
    * the policy pays before rolling it across 100 TB of chunks. Same
    * crash-safe swap as [[compactChunk]]. */
  def compactChunkMeasured(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      chunk: String,
      sortCols: Seq[String] = Seq("entity_id", "time"),
      targetFiles: Int = 1): CompactionAudit = {
    val (fs, root) = hadoopFs(spark, path)
    val chunkDir = new org.apache.hadoop.fs.Path(root, s"chunk=$chunk")
    val (fb, bb) = parquetStats(fs, chunkDir)
    compactChunk(spark, path, chunk, targetFiles, sortCols)
    val (fa, ba) = parquetStats(fs, chunkDir)
    CompactionAudit(chunk, sortCols, fb, bb, fa, ba)
  }

  /** Layout-side analog of the reference's attributes TEXT → JSONB
    * migration (`migrations.py:57-66`), for the PARQUET sink: rewrite an
    * existing `"json"`-encoded layout to Spark 4 VariantType
    * (`"variant"` — the JSONB mapping, SURVEY §1.2) IN PLACE, chunk by
    * chunk, so an established deployment gains `variant_get` extraction
    * without re-ingesting history. Protocol: the marker is stamped
    * `migratingEncoding` FIRST (readers, appenders, and compaction
    * refuse the layout while set — a half-migrated layout mixes physical
    * types across chunks and breaks schema merge), then every chunk is
    * rewritten through the compaction swap (staged dot-dir → retire →
    * swap-in), and one final marker write commits
    * `attributesEncoding = "variant"` and lifts the lock. Crash
    * recovery is RE-RUNNING the migration: per chunk it first restores
    * a live dir from a staged/retired survivor, then skips chunks whose
    * parquet already holds variant — idempotent at every crash point.
    * Returns the chunks rewritten by THIS run. Scale: chunk-local
    * rewrites behind ingest, exactly like compaction — the reference
    * migrates its whole table in one ALTER because PostgreSQL can; a
    * 100 TB layout migrates incrementally, and the lock is what keeps
    * readers correct meanwhile. */
  def migrateAttributesEncoding(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      target: String = "variant"): Seq[String] = {
    require(target == "variant",
      s"only the json -> variant (JSONB) direction exists, got '$target'")
    val m0 = readLayoutMarker(spark, path).getOrElse(throw new IllegalStateException(
      s"layout at $path has no marker — its encoding is unknown; rewrite with " +
        "writeParquet(SaveMode.Overwrite, attributesEncoding = \"variant\") instead"))
    m0.compacting.foreach { c =>
      throw new IllegalStateException(
        s"layout at $path has an unfinished compaction of chunk '$c' — " +
          "run recoverCompaction before migrating")
    }
    if (m0.attributesEncoding == target && m0.migrating.isEmpty) return Nil
    val (fs, root) = hadoopFs(spark, path)
    if (m0.migrating.isEmpty)
      writeLayoutMarker(spark, path,
        m0.copy(generation = m0.generation + 1, migrating = Some(target)))
    // discover chunks from live dirs AND the hidden migration copies: a
    // crash between the renames leaves a chunk with NO live dir, visible
    // only as its staged/retired survivor — a live-only listing would
    // silently skip it and the commit below would strand its rows
    val names = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    val chunks = (names.filter(_.startsWith("chunk=")).map(_.stripPrefix("chunk=")) ++
      names.filter(_.startsWith(".migrate_staged_chunk_"))
        .map(_.stripPrefix(".migrate_staged_chunk_")) ++
      names.filter(_.startsWith(".migrate_retired_chunk_"))
        .map(_.stripPrefix(".migrate_retired_chunk_"))).distinct.sorted.toSeq
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    // a dir "has rows" only if it holds at least one data file —
    // `spark.read.parquet` on an existing-but-file-less dir (crash
    // residue, manual cleanup) throws "Unable to infer schema" and
    // would abort the migration with the layout still marker-locked
    def hasDataFiles(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(p) && fs.listStatus(p).exists { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    for (c <- chunks) {
      val chunkDir = new org.apache.hadoop.fs.Path(root, s"chunk=$c")
      val staged = new org.apache.hadoop.fs.Path(root, s".migrate_staged_chunk_$c")
      val retired = new org.apache.hadoop.fs.Path(root, s".migrate_retired_chunk_$c")
      // crash recovery: a prior run may have died between the renames —
      // restore a live dir from whichever hidden copy survived (staged
      // is complete by construction once the retire rename began). A
      // live dir that exists but is FILE-LESS counts as missing: a
      // recoverable copy replaces it, and with no copy anywhere the
      // husk is swept and the chunk skipped — zero rows need migrating.
      if (!hasDataFiles(chunkDir)) {
        fs.delete(chunkDir, true)
        val src =
          if (hasDataFiles(staged)) Some(staged)
          else if (hasDataFiles(retired)) Some(retired)
          else None
        src match {
          case Some(s) =>
            if (!fs.rename(s, chunkDir))
              throw new java.io.IOException(
                s"chunk '$c' could not be restored from $s under $path")
          case None =>
            // file-less husks everywhere: zero rows need migrating —
            // sweep the residue and move on instead of aborting with
            // the layout still locked. Named out loud: crash residue
            // is the expected cause, but externally-lost chunk FILES
            // look identical from here, and a silent sweep would mask
            // that loss
            System.err.println(
              s"[ltss-migrate] WARN chunk '$c' under $path has no data " +
                "files in its live, staged, or retired dirs — sweeping " +
                "the empty dirs and skipping it. If this chunk ever " +
                "held rows, they were lost OUTSIDE this migration.")
            fs.delete(staged, true)
            fs.delete(retired, true)
        }
      }
      if (fs.exists(chunkDir)) {
        fs.delete(staged, true)
        fs.delete(retired, true)
        val df = spark.read.parquet(chunkDir.toString)
        if (df.schema("attributes").dataType !=
            org.apache.spark.sql.types.VariantType) {
          df.withColumn("attributes", parse_json(col("attributes")))
            .write.mode(SaveMode.Overwrite).parquet(staged.toString)
          if (!fs.rename(chunkDir, retired))
            throw new java.io.IOException(s"migration could not retire $chunkDir")
          if (!fs.rename(staged, chunkDir))
            throw new java.io.IOException(
              s"migration could not swap in $staged — original preserved at $retired")
          fs.delete(retired, true)
          done += c
        }
      }
    }
    val m1 = readLayoutMarker(spark, path).getOrElse(m0)
    writeLayoutMarker(spark, path, m1.copy(generation = m1.generation + 1,
      attributesEncoding = target, migrating = None))
    done.toSeq
  }

  /** Repair a compaction interrupted at any point, using the marker's
    * `compacting` stamp plus which of the live/staged/retired dirs
    * survive. Every crash point lands in exactly one case:
    *
    *  1. live chunk intact (crash before the retire rename, or after the
    *     swap-in completed): discard hidden leftovers;
    *  2. live chunk missing, staged copy COMPLETE (`_SUCCESS` present —
    *     crash between the two renames): finish the swap-in;
    *  3. live chunk missing, staged absent/incomplete: restore the
    *     retired original.
    *
    * Idempotent; clears the stamp at the end. Returns the action taken,
    * or None when no compaction was in flight. */
  def recoverCompaction(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[String] = {
    val marker = readLayoutMarker(spark, path)
    marker.flatMap(m => m.compacting).map { chunk =>
      val (fs, root) = hadoopFs(spark, path)
      val chunkDir = new org.apache.hadoop.fs.Path(root, s"chunk=$chunk")
      val staged = new org.apache.hadoop.fs.Path(root, s".compact_staged_chunk_$chunk")
      val retired = new org.apache.hadoop.fs.Path(root, s".compact_retired_chunk_$chunk")
      val action =
        if (fs.exists(chunkDir)) {
          fs.delete(staged, true)
          fs.delete(retired, true)
          "discarded_leftovers"
        } else if (fs.exists(staged) &&
          fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS"))) {
          if (!fs.rename(staged, chunkDir))
            throw new java.io.IOException(s"recovery could not swap in $staged")
          fs.delete(retired, true)
          "completed_swap"
        } else if (fs.exists(retired)) {
          if (!fs.rename(retired, chunkDir))
            throw new java.io.IOException(s"recovery could not restore $retired")
          fs.delete(staged, true)
          "restored_original"
        } else
          throw new java.io.IOException(
            s"chunk '$chunk' of $path is unrecoverable: live, staged and " +
              "retired copies are all missing")
      writeLayoutMarker(spark, path, marker.get.copy(compacting = None))
      action
    }
  }

  /** Render the `location` struct as WKT text for relational targets —
    * the reference stores `SRID=4326;POINT(lon lat)` into the geometry
    * column (models.py:61); Spark's JDBC writer has no struct mapping,
    * so the WKT string IS the wire format. Parquet targets keep the
    * typed struct. No-op when the column is absent or already a string. */
  def locationToWkt(ltss: DataFrame): DataFrame =
    ltss.schema.fields.find(_.name == "location") match {
      case Some(f) if f.dataType.typeName == "struct" =>
        ltss.withColumn("location",
          when(col("location").isNotNull,
            concat(lit("SRID=4326;POINT("), col("location.lon").cast("string"),
              lit(" "), col("location.lat").cast("string"), lit(")"))))
      case _ => ltss
    }

  /** Inverse of [[locationToWkt]]: the reference's WKT wire form
    * (`SRID=4326;POINT(lon lat)`, models.py:61) parsed back to the
    * engine's (lon, lat) struct. Anything that is not exactly that
    * shape — NULL, another SRID, a non-point — stays NULL rather than
    * fabricating coordinates. */
  def locationFromWkt(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pat = "^SRID=4326;POINT\\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$"
    when(c.isNotNull && c.rlike(pat),
      struct(
        regexp_extract(c, pat, 1).cast("double").as("lon"),
        regexp_extract(c, pat, 2).cast("double").as("lat")))
  }

  /** Bulk import of an EXISTING reference deployment's table — the
    * migration path a real user of the reference needs on day one:
    * their history lives in PostgreSQL/TimescaleDB (models.py:27-44),
    * and switching engines starts with one parallel range-scan of it.
    * The read is PARTITIONED on the PK's time axis (the table's own
    * min/max bounds split into `numPartitions` ranges), so each
    * executor range-scans the composite `(time, entity_id)` index
    * server-side — at a real deployment's size this is the difference
    * between one cursor streaming 10⁹ rows and a cluster-wide ingest.
    * Pair with [[writeParquet]] to land the chunked layout and
    * [[locationFromWkt]] to restore the geo struct. */
  def importJdbc(
      spark: org.apache.spark.sql.SparkSession,
      cfg: LtssConfig,
      table: String = "ltss",
      numPartitions: Int = 32): DataFrame = {
    val props = new java.util.Properties()
    // bounds as text so the 1-row probe needs only string decoding;
    // DBMS-rendered timestamps parse back as partition bounds verbatim
    val bounds = spark.read.jdbc(cfg.dbUrl,
      s"(SELECT CAST(min(time) AS VARCHAR) AS lo, CAST(max(time) AS VARCHAR) AS hi " +
        s"FROM $table) graft_bounds", props).head()
    if (bounds.isNullAt(0) || bounds.getString(0) == bounds.getString(1))
      // empty table or a single distinct time: nothing to range-split
      spark.read.jdbc(cfg.dbUrl, table, props)
    else
      spark.read.format("jdbc")
        .option("url", cfg.dbUrl)
        .option("dbtable", table)
        .option("partitionColumn", "time")
        .option("lowerBound", bounds.getString(0))
        .option("upperBound", bounds.getString(1))
        .option("numPartitions", numPartitions)
        .load()
  }

  /** The chunk partition value covering a timestamp (UTC). */
  def chunkDateOf(ts: java.sql.Timestamp, cfg: LtssConfig): java.time.LocalDate = {
    val epochUs = ts.getTime * 1000L
    val floored = epochUs - java.lang.Math.floorMod(epochUs, cfg.chunkTimeIntervalUs)
    java.time.Instant.ofEpochMilli(floored / 1000L).atZone(java.time.ZoneOffset.UTC).toLocalDate
  }

  // ------------------------------------------------------------ layout marker

  /** Layout metadata recorded next to the data (underscore prefix →
    * invisible to partition discovery). The `set_chunk_time_interval`
    * analog: the reference re-applies the configured interval on every
    * startup (reference __init__.py:284-300); a parquet layout cannot
    * rechunk in place, so the interval (and any materialized attribute
    * keys) used at write time are RECORDED and later appends with a
    * different configuration are refused — silently mixing partition
    * widths in one directory would corrupt [[chunkScan]]'s pruning
    * bounds for the old chunks. */
  final case class LayoutMarker(
      chunkTimeIntervalUs: Long,
      attrKeys: Seq[(String, String)],
      generation: Long = 0L,
      compacting: Option[String] = None,
      /** How the `attributes` column is physically encoded: "json"
        * (string, the reference's wire form) or "variant" (Spark 4
        * VariantType — the modern JSONB mapping, SURVEY §1.2). Recorded
        * so appends cannot silently mix encodings in one layout. */
      attributesEncoding: String = "json",
      /** Set while [[migrateAttributesEncoding]] rewrites chunks to the
        * named target encoding: readers and appenders refuse the layout
        * until the migration commits (a half-migrated layout mixes
        * physical types across chunks — schema merge breaks). Recovery
        * is re-running the migration, which is idempotent per chunk. */
      migrating: Option[String] = None)

  private val MarkerName = "_ltss_layout.json"

  def readLayoutMarker(
      spark: org.apache.spark.sql.SparkSession, path: String): Option[LayoutMarker] = {
    val (fs, root) = hadoopFs(spark, path)
    val p = new org.apache.hadoop.fs.Path(root, MarkerName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val interval = "\"chunkTimeIntervalUs\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toLong)
      .getOrElse(throw new java.io.IOException(s"malformed layout marker at $p: $text"))
    val keys = "\\[\"([^\"]+)\",\"([^\"]+)\"\\]".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toSeq
    val generation = "\"generation\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
    val compacting = "\"compacting\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(text).map(_.group(1))
    // absent in pre-variant markers -> "json", their only encoding
    val encoding = "\"attributesEncoding\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("json")
    val migrating = "\"migratingEncoding\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(text).map(_.group(1))
    Some(LayoutMarker(interval, keys, generation, compacting, encoding, migrating))
  }

  private[graft] def writeLayoutMarker(
      spark: org.apache.spark.sql.SparkSession, path: String, m: LayoutMarker): Unit = {
    val (fs, root) = hadoopFs(spark, path)
    val p = new org.apache.hadoop.fs.Path(root, MarkerName)
    val keys = m.attrKeys.map { case (k, t) => s"""["$k","$t"]""" }.mkString("[", ",", "]")
    val compacting = m.compacting.map(c => s""","compacting":"$c"""").getOrElse("")
    val migrating = m.migrating.map(t => s""","migratingEncoding":"$t"""").getOrElse("")
    val out = fs.create(p, true)
    try out.write(
      (s"""{"chunkTimeIntervalUs":${m.chunkTimeIntervalUs},"attrKeys":$keys""" +
        s""","generation":${m.generation}$compacting$migrating""" +
        s""","attributesEncoding":"${m.attributesEncoding}"}""").getBytes("UTF-8"))
    finally out.close()
  }

  /** Time-range scan of the chunked layout with CHUNK EXCLUSION: the
    * time predicate is widened to a `chunk` partition predicate, so the
    * scan partition-prunes to the covered chunks before any file is
    * opened — the TimescaleDB hypertable chunk-exclusion analog
    * (reference __init__.py:337-344). The pruning bounds use the
    * interval RECORDED in the layout marker when present — the caller's
    * cfg cannot silently mis-prune a layout written with a different
    * interval. */
  def chunkScan(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      from: java.sql.Timestamp,
      to: java.sql.Timestamp,
      cfg: LtssConfig = LtssConfig()): DataFrame = {
    val marker = readLayoutMarker(spark, path)
    // a mid-swap chunk may be absent from the directory listing for the
    // instant between compaction's two renames — or forever, after a
    // crash between them; mid-migration, chunks mix physical types.
    // Refuse to silently return a partial or mis-typed layout.
    requireUnlocked(marker, path, "before scanning")
    val effective = marker
      .map(m => cfg.copy(chunkTimeIntervalUs = m.chunkTimeIntervalUs))
      .getOrElse(cfg)
    val lo = java.sql.Date.valueOf(chunkDateOf(from, effective))
    val hi = java.sql.Date.valueOf(chunkDateOf(to, effective))
    spark.read.parquet(path)
      .filter(col("chunk").between(lit(lo), lit(hi)))
      .filter(col("time").between(lit(from), lit(to)))
  }

  /** Write LTSS rows as a time-chunked, entity-sorted parquet layout.
    *
    * `attrKeys` materializes configured JSON attribute keys as TYPED
    * COLUMNS `attr_<key>` at ingest (the GIN-expression-index analog of
    * the reference's JSONB index, models.py:75-77): predicates on the
    * extracted column push into the parquet scan instead of re-parsing
    * the JSON per row per query.
    *
    * An existing layout's marker is authoritative: appending with a
    * different chunk interval or attribute-key set throws (rewrite with
    * SaveMode.Overwrite to rechunk). */
  def writeParquet(
      ltss: DataFrame,
      path: String,
      cfg: LtssConfig = LtssConfig(),
      mode: SaveMode = SaveMode.Append,
      attrKeys: Seq[(String, String)] = Nil,
      /** "json" stores `attributes` as the wire-form JSON string;
        * "variant" parses it to Spark 4 VariantType at write (the
        * modern JSONB mapping, SURVEY §1.2): the parquet files then
        * hold the binary variant encoding, `variant_get` extractions
        * skip per-query string re-parsing, and malformed JSON fails AT
        * INGEST (loudly — P4 upstream drops invalid rows first) rather
        * than at every reader. Typed `attrKeys` remain the PRUNING
        * device either way: variant columns carry no min/max stats, so
        * predicates on variant extractions do not reach the scan
        * ([[graft.PlanSpec]] pins that contrast). */
      attributesEncoding: String = "json"): Unit = {
    val spark = ltss.sparkSession
    require(attributesEncoding == "json" || attributesEncoding == "variant",
      s"attributesEncoding must be 'json' or 'variant', got '$attributesEncoding'")
    // keys become identifiers in both the column name and the hand-built
    // marker JSON — restrict to identifier characters up front
    attrKeys.foreach { case (k, _) =>
      require(k.matches("[A-Za-z0-9_]+"),
        s"materialized attribute key '$k' must match [A-Za-z0-9_]+")
    }
    val marker = readLayoutMarker(spark, path)
    if (mode != SaveMode.Overwrite) {
      requireUnlocked(marker, path, "before appending")
      marker.foreach { m =>
        if (m.chunkTimeIntervalUs != cfg.chunkTimeIntervalUs)
          throw new IllegalStateException(
            s"layout at $path was written with chunk_time_interval " +
              s"${m.chunkTimeIntervalUs} µs; refusing to append with " +
              s"${cfg.chunkTimeIntervalUs} µs — mixed chunk widths would break " +
              "chunk exclusion. Rewrite the layout (SaveMode.Overwrite) to rechunk.")
        if (m.attrKeys != attrKeys)
          throw new IllegalStateException(
            s"layout at $path materializes attribute keys ${m.attrKeys}; " +
              s"refusing to append with $attrKeys — rewrite the layout to change them.")
        if (m.attributesEncoding != attributesEncoding)
          throw new IllegalStateException(
            s"layout at $path encodes attributes as '${m.attributesEncoding}'; " +
              s"refusing to append '$attributesEncoding' — mixed physical types in " +
              "one column break every reader. Rewrite the layout to re-encode, or " +
              "run migrateAttributesEncoding for the json -> variant direction.")
      }
    }
    // a marker-less layout WITH existing chunks predates the marker (or
    // lost it): its true chunk widths are unknown, so an append must NOT
    // stamp this writer's interval as authoritative — that would make
    // chunkScan prune the legacy chunks with the wrong bounds. The
    // layout stays marker-less (scans fall back to the caller's cfg, as
    // before the marker existed) until an Overwrite rebuilds it.
    val legacyUnmarked = mode != SaveMode.Overwrite && marker.isEmpty && {
      val (fs, root) = hadoopFs(spark, path)
      fs.exists(root) && fs.listStatus(root)
        .exists(st => st.isDirectory && st.getPath.getName.startsWith("chunk="))
    }
    val enriched = attrKeys.foldLeft(ltss) { case (df, (k, tpe)) =>
      df.withColumn(s"attr_$k", get_json_object(col("attributes"), s"$$.$k").cast(tpe))
    }
    // attrKeys extract from the STRING form above, so the two features
    // compose; the variant parse replaces the column last
    val encoded =
      if (attributesEncoding == "variant")
        enriched.withColumn("attributes", parse_json(col("attributes")))
      else enriched
    encoded
      .withColumn("chunk", chunkCol(cfg))
      .repartition(col("chunk"))
      .sortWithinPartitions(col("entity_id"), col("time"))
      .write
      .mode(mode)
      .partitionBy("chunk")
      .parquet(path)
    if (!legacyUnmarked)
      writeLayoutMarker(spark, path, LayoutMarker(cfg.chunkTimeIntervalUs, attrKeys,
        generation = marker.map(_.generation).getOrElse(0L),
        attributesEncoding = attributesEncoding))
  }

  /** Bucketed-table sink — the layout for REPEATED per-entity joins
    * (cross-source enrichment, as-of pairing against a second stream,
    * entity-dimension joins): the table pre-shuffles on `entity_id` at
    * write time (`bucketBy` + in-bucket sort on (entity_id, time)), so
    * every later equi-join or aggregation on the entity key plans with
    * NO exchange on this side — bucketing ≙ persisted shuffle, the same
    * trade the chunked layout makes for time pruning. Use the chunked
    * [[writeParquet]] layout when the axis of reuse is TIME (dashboards,
    * retention); use this one when it is the ENTITY key (joins) —
    * pinned by PlanSpec's exchange-free join assertion. */
  def writeBucketedTable(
      ltss: DataFrame, table: String, nBuckets: Int = 32): Unit =
    ltss.write
      .bucketBy(nBuckets, "entity_id")
      .sortBy("entity_id", "time")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** STORED TRAJECTORIES — the `ST_MakeLine` object as a layout: each
    * entity's ordered fix array, materialized per (entity, month
    * chunk). The reference stores one `Geometry("POINT", srid=4326)`
    * per row (models.py:35,44) and leaves line assembly to PostGIS
    * queries; a columnar engine materializes the line ONCE so track
    * consumers (length, bbox, rendering) read arrays instead of
    * re-sorting the corpus per query.
    *
    * Input contract: `(id, ts, seq, lat, lon)` with `(ts, seq)` a
    * per-id total order. Segmentation is the same time-chunking policy
    * as the history layout: one array per (id, month), NOT one per id —
    * an unbounded per-entity array is the collect-the-corpus
    * anti-pattern at 100 TB, while a chunk-bounded segment caps array
    * size at the entity's per-month fix rate no matter how many years
    * accumulate. Arrays are `sort_array`-ordered (struct order =
    * (ts, seq, …), a total order), so downstream leg math needs no
    * window; the layout is range-partitioned and sorted by
    * (id, chunk), so per-entity reads prune files and cross-segment
    * stitching (the lag-to-previous-segment join) is a co-located
    * window, not a shuffle. */
  def writeTrackLayout(pts: DataFrame, path: String, parts: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    val spark = pts.sparkSession
    pts.toDF("id", "ts", "seq", "lat", "lon")
      .withColumn("chunk", date_trunc("month", col("ts")))
      .groupBy(col("id"), col("chunk"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("seq"), col("lat"), col("lon")))).as("seg"))
      .withColumn("n_fixes", size(col("seg")))
      // month DIRECTORIES (chunk_key) so incremental maintenance
      // ([[appendTrackMonth]]) rewrites one month, never the layout;
      // `chunk` stays a DATA column — consumers are untouched
      .withColumn("chunk_key", date_format(col("chunk"), "yyyy-MM"))
      .repartitionByRange(parts, col("id"), col("chunk"))
      .sortWithinPartitions(col("id"), col("chunk"))
      .write.mode(SaveMode.Overwrite).partitionBy("chunk_key").parquet(path)
    // interval 0 = calendar-month chunking (non-uniform width — the
    // track layout's policy is date_trunc('month'), not a fixed µs grid)
    writeLayoutMarker(spark, path, LayoutMarker(0L, Nil))
  }

  /** INCREMENTAL track-layout maintenance — the batch landing path for
    * `trackSegmentStream`'s closed segments (and for month backfills):
    * an IDEMPOTENT per-(id, month) segment UPSERT into the layout
    * [[writeTrackLayout]] wrote. An incoming `(id, chunk)` REPLACES
    * any stored twin (a replayed emission is therefore a no-op by
    * content); entities and months not named stay byte-untouched —
    * only the affected month DIRECTORIES rewrite, which is what makes
    * this the daily-batch shape at 100 TB (the `dedup_incremental`
    * pattern applied to the layout: merge against the store's affected
    * slice, never rescan the corpus).
    *
    * Protocol, under the layout marker lock like every other lifecycle
    * mutation: stamp `migrating = "appending"`, stage the merged
    * months under a hidden dot-dir (the stage READS complete before
    * any live dir moves), then per month retire → swap-in → drop
    * retired (the [[compactChunk]] swap). Crash recovery is RE-RUNNING
    * the append with the same segments: entry first restores any
    * retired month dir whose live twin vanished (the only copy), and
    * the merge is idempotent at every crash point. Input columns:
    * `(id, chunk, n_fixes, seg)` — `trackSegmentStream`'s emission
    * schema. Caller contract: run under the SAME session timezone as
    * the layout's writer (month keys are session-tz calendar months,
    * the layout's own chunking policy). */
  def appendTrackMonth(
      segments: DataFrame, path: String, parts: Int = 32,
      force: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    val spark = segments.sparkSession
    val incoming = segments.toDF("id", "chunk", "n_fixes", "seg")
      .select(col("id"), col("chunk"), col("seg"), col("n_fixes"))
    val marker = readLayoutMarker(spark, path).getOrElse(
      throw new IllegalStateException(
        s"track layout at $path has no marker — rebuild it with " +
          "writeTrackLayout before appending"))
    // "appending:<owner>" residue from a DEAD owner is this protocol's
    // own crash face — recovery is re-running the append, so it passes;
    // a LIVE owner (same JVM, or a live pid on this host, or any other
    // host absent `force`) refuses: two interleaved stage/retire/swap
    // sequences on the same month dirs can lose a month. Any other lock
    // (compaction, encoding migration) refuses as usual.
    acquireLifecycleLock(path, "appending", marker, force)
    try {
    writeLayoutMarker(spark, path, marker.copy(
      generation = marker.generation + 1,
      migrating = Some(s"appending:${ownerToken()}")))
    val (fs, root) = hadoopFs(spark, path)
    // crash restore: a retired month dir without a live twin holds the
    // ONLY copy of that month — restore it before reading
    fs.listStatus(root)
      .filter(_.getPath.getName.startsWith(".append_retired_"))
      .foreach { st =>
        val k = st.getPath.getName.stripPrefix(".append_retired_")
        val live = new org.apache.hadoop.fs.Path(root, s"chunk_key=$k")
        if (!fs.exists(live) && !fs.rename(st.getPath, live))
          throw new java.io.IOException(
            s"could not restore crashed append residue ${st.getPath}")
      }
    val staged = new org.apache.hadoop.fs.Path(root, ".append_staged")
    fs.delete(staged, true)
    // bounded planning collect: distinct MONTHS in the batch, not rows
    val monthKeys = incoming
      .select(date_format(col("chunk"), "yyyy-MM").as("k"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    val existing = spark.read.parquet(path)
      .filter(col("chunk_key").isin(monthKeys: _*)) // partition-pruned
      .select(col("id"), col("chunk"), col("seg"), col("n_fixes"))
    val merged = existing
      .join(incoming.select(col("id"), col("chunk")), Seq("id", "chunk"), "left_anti")
      .unionByName(incoming)
      .withColumn("chunk_key", date_format(col("chunk"), "yyyy-MM"))
      .repartitionByRange(parts, col("id"), col("chunk"))
      .sortWithinPartitions(col("id"), col("chunk"))
    merged.write.mode(SaveMode.Overwrite).partitionBy("chunk_key")
      .parquet(staged.toString)
    for (k <- monthKeys) {
      val live = new org.apache.hadoop.fs.Path(root, s"chunk_key=$k")
      val in = new org.apache.hadoop.fs.Path(staged, s"chunk_key=$k")
      val retired = new org.apache.hadoop.fs.Path(root, s".append_retired_$k")
      fs.delete(retired, true)
      if (fs.exists(live) && !fs.rename(live, retired))
        throw new java.io.IOException(s"append could not retire $live")
      if (!fs.rename(in, live))
        throw new java.io.IOException(
          s"append could not swap in $in — prior month preserved at $retired")
      fs.delete(retired, true)
    }
    fs.delete(staged, true)
    writeLayoutMarker(spark, path, marker.copy(
      generation = marker.generation + 2, migrating = None))
    } finally releaseLifecycleLock(path, "appending")
  }

  /** STORED ZONES — polygon STORAGE (the last §7.4 PostGIS-geometry
    * cut): each zone is one row `(zone_id, name, verts)` with the ring
    * as an ordered `array<struct<x:lon, y:lat>>`, plus materialized
    * bbox columns so consumers can SARGABLY prune before any exact
    * containment test (the same prune-then-exact shape as
    * `HaversineBoxRule`). The write REJECTS degenerate rings: fewer
    * than 3 vertices, or zero shoelace area (all vertices collinear —
    * no interior exists for containment to mean anything). Axis-
    * aligned rings — rectangles, the single most common real zone —
    * are FIRST-CLASS: every even-odd consumer nests its crossing test
    * under the straddle gate `(y1 > lat) != (y2 > lat)` (explicit
    * nested `when`/CASE, `GeoMath.insideRing`'s short-circuit), so a
    * horizontal edge contributes 0 crossings by construction and its
    * 0/0 slope is never evaluated — the same arbitrary-polygon
    * contract as PostGIS `ST_Within` over the reference's geometry
    * column (models.py:35,44). Zones are a dimension table (a
    * deployment has thousands, not billions) — stored sorted by id,
    * always broadcast by consumers. */
  def writeZoneLayout(zones: DataFrame, path: String, version: Long = 0L): Unit = {
    // A REDRAW must advance zone_version like an upsert does: the
    // version exists so a restarted stream whose checkpoint holds
    // containment sets computed against the OLD rings fails the
    // requireZoneVersion gate instead of silently diffing against the
    // redrawn table. Default (0 = auto) reads the prior marker BEFORE
    // the Overwrite clears it and stamps prior+1 (a fresh directory
    // stamps 1, the historical default); an explicit version must
    // exceed the stored one for the same reason.
    //
    // CRASH WINDOW: the marker lives INSIDE the directory the
    // Overwrite clears, so a crash between the Overwrite and the
    // marker write would lose the generation — the NEXT redraw would
    // read prior = 0 and stamp 1 again, re-arming the silent-diff
    // hazard for any state pinned to the original version 1. The
    // intended version therefore persists in a SIDECAR next to the
    // layout (temp write + atomic rename) BEFORE the Overwrite and is
    // removed only after the marker lands; version reads take the MAX
    // of marker and surviving sidecar, so a torn redraw can only skip
    // version numbers forward, never reuse one.
    val spark = zones.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val intentPath = new org.apache.hadoop.fs.Path(path + ".zver_intent")
    val fs = intentPath.getFileSystem(conf)
    // WRITE-path prior takes the MAX of marker and surviving intent
    // (unlike the read path, which prefers a present marker): a torn
    // prior redraw may have left intent > marker, and the next stamp
    // must skip past BOTH so no version number is ever reused
    val prior = math.max(
      readLayoutMarker(spark, path).map(_.generation).getOrElse(0L),
      readZoneVersionIntent(spark, path))
    require(version == 0L || version > prior,
      s"writeZoneLayout version $version must exceed the stored " +
        s"zone_version $prior (a redraw that keeps or lowers the version " +
        "would let restarted streams silently diff state held against " +
        "the retired rings); pass 0 to auto-bump")
    val v = if (version == 0L) prior + 1L else version
    val frame = zoneLayoutFrame(zones) // validate BEFORE staking the intent
    locally {
      val tmp = new org.apache.hadoop.fs.Path(path + ".zver_intent.tmp")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(intentPath, false)
      if (!fs.rename(tmp, intentPath))
        throw new java.io.IOException(s"could not stake $intentPath")
    }
    frame.write.mode(SaveMode.Overwrite).parquet(path)
    // marker AFTER the Overwrite (which clears the directory): the
    // generation field IS the zone_version the streaming twins pin
    // their bootstrapped containment state to (see geoZonesStream)
    writeLayoutMarker(spark, path, LayoutMarker(0L, Nil, generation = v))
    fs.delete(intentPath, false)
  }

  /** The validated, bbox-materialized zone frame both the full rebuild
    * and the upsert stage write. EAGER validation (a planning-sized
    * collect over the dimension): a bad ring refuses the call before
    * any file moves. */
  private def zoneLayoutFrame(zones: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val z = zones.toDF("zone_id", "name", "verts")
    val nxt = concat(expr("slice(verts, 2, size(verts) - 1)"),
      expr("slice(verts, 1, 1)"))
    val bad = z.select(col("zone_id"), size(col("verts")).as("n"),
        aggregate(
          zip_with(col("verts"), nxt,
            (a, b) => a("x") * b("y") - b("x") * a("y")),
          lit(0.0), (acc, x) => acc + x).as("shoelace"))
      .filter(col("n") < 3 || col("shoelace") === 0.0)
      .collect()
    require(bad.isEmpty,
      s"zone layout rejects ${bad.map(_.getLong(0)).mkString(", ")}: " +
        "a ring needs >= 3 vertices and nonzero shoelace area (a zero-area " +
        "ring has no interior for containment to test)")
    z.withColumn("lat_min", array_min(transform(col("verts"), v => v("y"))))
      .withColumn("lat_max", array_max(transform(col("verts"), v => v("y"))))
      .withColumn("lon_min", array_min(transform(col("verts"), v => v("x"))))
      .withColumn("lon_max", array_max(transform(col("verts"), v => v("x"))))
      .orderBy(col("zone_id"))
  }

  /** The surviving `.zver_intent` sidecar's staked version — 0 when
    * absent or unparsable (a torn temp-write reads as absent). Written
    * by [[writeZoneLayout]] BEFORE the Overwrite, removed only after
    * the marker lands, so in the torn window it alone carries the
    * generation. */
  private def readZoneVersionIntent(
      spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val intentPath = new org.apache.hadoop.fs.Path(path + ".zver_intent")
    val fs = intentPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // exists-then-open races the writer's final delete (the sidecar is
    // removed the instant the marker lands) — a file vanishing between
    // the two calls means the marker now carries the version, so
    // "absent" is the correct answer, not an exception
    try {
      if (!fs.exists(intentPath)) 0L
      else {
        val len = fs.getFileStatus(intentPath).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(intentPath)
        try in.readFully(0, buf) finally in.close()
        new String(buf, "UTF-8").trim.toLongOption.getOrElse(0L)
      }
    } catch {
      case _: java.io.FileNotFoundException => 0L
    }
  }

  /** The stored zone table's VERSION — the layout marker's generation,
    * bumped by every [[upsertZones]] (a legacy un-markered layout reads
    * 0). The streaming twins ([[graft.streaming.StreamingOps
    * .geoZonesStream]], `zonesDwellStream`) stamp this into their per-
    * entity state so held containment sets computed against retired
    * rings are detected on restart instead of silently diffed against
    * the redrawn table. The `.zver_intent` sidecar is consulted ONLY
    * when the marker is ABSENT — [[writeZoneLayout]]'s torn window
    * (Overwrite done, marker not yet written), where the sidecar alone
    * holds the staked version, so a stream bootstrapping there stamps
    * the INTENDED version instead of 0 and skips the spurious full
    * rebuild it would otherwise take once the marker lands. A PRESENT
    * marker always wins: in the pre-Overwrite window (intent staked,
    * old rings still live) the reader gets the OLD rings and must get
    * the OLD version with them — maxing in the intent there would pin
    * retired-ring state to the NEW version and silently defeat the
    * requireZoneVersion gate the stamp exists for. (The WRITE path's
    * skip-forward still takes the max of both — see writeZoneLayout —
    * so a torn redraw can never reuse a version number.) */
  def zoneLayoutVersion(
      spark: org.apache.spark.sql.SparkSession, path: String): Long =
    readLayoutMarker(spark, path).map(_.generation)
      .getOrElse(readZoneVersionIntent(spark, path))

  /** Driver-side read of the stored zone dimension as the `(zone_id,
    * ring)` constant the streaming twins broadcast, plus its version —
    * the bootstrap call of the zone-version contract. */
  def readZones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[(Long, Seq[(Double, Double)])], Long) = {
    val rows = spark.read.parquet(path)
      .select(col("zone_id"), col("verts")).orderBy(col("zone_id")).collect()
    val zones = rows.toIndexedSeq.map { r =>
      val ring = r.getSeq[org.apache.spark.sql.Row](1)
        .map(v => (v.getDouble(0), v.getDouble(1)))
      (r.getLong(0), ring)
    }
    (zones, zoneLayoutVersion(spark, path))
  }

  private val ZoneStageDir = ".zone_staged"
  private val ZoneManifestName = ".zone_staged_manifest"

  /** Roll FORWARD a committed zone-upsert swap (or discard an
    * uncommitted stage). The manifest at the layout root is the commit
    * point: written only after the staged layout is complete, it names
    * the new data files and the new version, so at any crash point the
    * swap is finishable deterministically — root data files NOT in the
    * manifest are the retired layout (delete), manifest names still in
    * the stage dir move in (names are unique per Spark write, so a
    * half-moved stage never collides), and the final marker carries
    * the manifest's version. No manifest = the stage never committed:
    * discard it, the live layout was never touched. */
  private def finishZoneSwap(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val manifest = new org.apache.hadoop.fs.Path(root, ZoneManifestName)
    val staged = new org.apache.hadoop.fs.Path(root, ZoneStageDir)
    // a crash between the temp write and its rename leaves an orphan
    // .tmp — never a commit point, always residue to discard
    fs.delete(new org.apache.hadoop.fs.Path(root, ZoneManifestName + ".tmp"), false)
    if (!fs.exists(manifest)) { fs.delete(staged, true); return }
    val in = fs.open(manifest)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // the temp-write+rename protocol makes a half-written manifest
    // unreachable, but defend in depth anyway: an UNPARSABLE manifest
    // (empty, or a garbled version line) is treated as UNCOMMITTED —
    // discard it and the stage, keep the live files — rather than
    // wedging the layout on NumberFormatException or, worse, replaying
    // a truncated name list as a committed swap
    val parsed = lines.headOption.flatMap(h => h.toLongOption)
    if (parsed.isEmpty) {
      fs.delete(manifest, false)
      fs.delete(staged, true)
      return
    }
    val version = parsed.get
    val names = lines.tail.filter(_.nonEmpty)
    val nameSet = names.toSet
    def isData(n: String) = !n.startsWith(".") && !n.startsWith("_")
    fs.listStatus(root)
      .filter(st => st.isFile && isData(st.getPath.getName) &&
        !nameSet(st.getPath.getName))
      .foreach(st => fs.delete(st.getPath, false))
    if (fs.exists(staged)) names.foreach { n =>
      val from = new org.apache.hadoop.fs.Path(staged, n)
      val to = new org.apache.hadoop.fs.Path(root, n)
      if (fs.exists(from) && !fs.exists(to) && !fs.rename(from, to))
        throw new java.io.IOException(s"zone swap could not move $from in")
    }
    fs.delete(staged, true)
    writeLayoutMarker(spark, root.toString, LayoutMarker(0L, Nil, generation = version))
    fs.delete(manifest, false)
  }

  /** ZONE-DIMENSION lifecycle — add, REPLACE (by id), and drop zones in
    * the stored layout [[writeZoneLayout]] wrote: the maintenance a
    * geofence table needs as zones are drawn and retired. An incoming
    * `(zone_id, name, verts)` row replaces any stored twin; ids named
    * in `dropIds` are removed; everything else carries over. The MERGED
    * set re-runs the full write gate (≥3 vertices, nonzero shoelace
    * area) and re-materializes every bbox, so a bad incoming ring
    * REFUSES the whole upsert and the stored layout stays untouched —
    * validation happens before any file moves because the merge is
    * staged through the driver, which is the RIGHT shape here: the
    * zone table is a broadcast DIMENSION (thousands of rows, not
    * billions — the [[writeZoneLayout]] contract), so collecting and
    * atomically rewriting kilobytes beats partial-update machinery at
    * any deployment size (the same dimension-sized-collect class as
    * the centroid planning tables). Replaying the same upsert is a
    * no-op by content (modulo one version bump per replay).
    *
    * Lifecycle contract (r16): incoming zone_ids must be DISTINCT — a
    * batch carrying two versions of one zone is ambiguous and refuses
    * before anything moves. The rewrite runs under the owner-token
    * marker lock ([[acquireLifecycleLock]] — same protocol as
    * [[appendTrackMonth]]), stages the merged layout under a hidden
    * dot-dir, and COMMITS by writing a manifest (new version + staged
    * file names) before any live file is touched; from the manifest on,
    * the swap rolls FORWARD deterministically at any crash point
    * ([[finishZoneSwap]], also run at entry to converge a predecessor's
    * residue). Every successful upsert bumps the layout's zone_version
    * (marker generation), which the streaming twins pin their state to. */
  def upsertZones(
      zones: DataFrame, path: String, dropIds: Seq[Long] = Nil,
      force: Boolean = false): Unit = {
    val spark = zones.sparkSession
    val incoming = zones.toDF("zone_id", "name", "verts")
    val incomingIds = incoming.select(col("zone_id")).collect().map(_.getLong(0))
    val dup = incomingIds.groupBy(identity).collect { case (id, hits) if hits.length > 1 => id }
    require(dup.isEmpty,
      s"upsertZones requires distinct incoming zone_ids — duplicated: " +
        s"${dup.toSeq.sorted.mkString(", ")} (two versions of one zone in " +
        "a batch is ambiguous; pre-reduce to the intended row per id)")
    val marker0 = readLayoutMarker(spark, path)
      .getOrElse(LayoutMarker(0L, Nil)) // legacy un-markered layout = version 0
    acquireLifecycleLock(path, "zone-upsert", marker0, force)
    try {
      val (fs, root) = hadoopFs(spark, path)
      finishZoneSwap(spark, fs, root) // converge any crashed predecessor first
      val cur = readLayoutMarker(spark, path).getOrElse(LayoutMarker(0L, Nil))
      writeLayoutMarker(spark, path, cur.copy(
        migrating = Some(s"zone-upsert:${ownerToken()}")))
      val staged = new org.apache.hadoop.fs.Path(root, ZoneStageDir)
      val manifest = new org.apache.hadoop.fs.Path(root, ZoneManifestName)
      try {
        val gone = (dropIds ++ incomingIds).toSet
        val kept = spark.read.parquet(path)
          .select(col("zone_id"), col("name"), col("verts"))
          .filter(!col("zone_id").isin(gone.toSeq: _*))
        fs.delete(staged, true)
        // the stage READS the live files (still untouched) and validates
        // the merged set before the manifest commits anything
        zoneLayoutFrame(kept.unionByName(incoming))
          .write.mode(SaveMode.Overwrite).parquet(staged.toString)
        val names = fs.listStatus(staged).map(_.getPath.getName)
          .filter(n => !n.startsWith(".") && !n.startsWith("_")).sorted
        // the manifest IS the commit point, so its WRITE must be atomic:
        // create+write straight at the final name can crash mid-stream,
        // and a truncated name list would read as a committed swap that
        // deletes live files absent from it. Write to a temp name and
        // rename in — rename is the atomic commit on HDFS and local —
        // so the manifest either exists complete or not at all.
        val tmp = new org.apache.hadoop.fs.Path(root, ZoneManifestName + ".tmp")
        fs.delete(tmp, false)
        val out = fs.create(tmp, true)
        try out.write(((cur.generation + 1) +: names.toSeq)
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
        if (!fs.rename(tmp, manifest))
          throw new java.io.IOException(
            s"zone upsert could not commit the manifest at $manifest")
      } catch {
        case e: Throwable =>
          // an in-process refusal (e.g. the ring gate) is not a crash:
          // nothing committed, so discard the stage (and any orphan
          // manifest temp) and hand the layout back unlocked instead of
          // leaving takeover residue
          if (!fs.exists(manifest)) {
            fs.delete(new org.apache.hadoop.fs.Path(
              root, ZoneManifestName + ".tmp"), false)
            fs.delete(staged, true)
            writeLayoutMarker(spark, path, cur)
          }
          throw e
      }
      finishZoneSwap(spark, fs, root) // the commit point has passed: swap
    } finally releaseLifecycleLock(path, "zone-upsert")
  }

  /** Per-backend column types for the dynamic columns — the analog of
    * the reference's Postgres-specific DDL (`attributes JSONB`,
    * `__init__.py:315-344`). `null` arguments to [[bootstrapJdbc]]
    * resolve through this; explicit arguments override. */
  def defaultTypesFor(url: String): (String, String) =
    if (url.startsWith("jdbc:postgresql")) ("JSONB", "VARCHAR(255)")
    else if (url.startsWith("jdbc:derby")) ("CLOB", "CLOB")
    else ("VARCHAR(32000)", "VARCHAR(255)")

  /** D1 + L1: startup bootstrap, mirroring the reference's
    * `_setup_connection`/`_create_table` (__init__.py:257-344) and its
    * connect-retry loop (__init__.py:124-139, ≤10 tries × 3 s):
    * connect with bounded retry (throwing the last error once exhausted —
    * the analog of the reference's give-up + user notification,
    * __init__.py:141-153), introspect the catalog, and create the table
    * with explicit column types and the composite PK `(time, entity_id)`
    * (migrations.py:88-95) only if missing. Returning normally IS the
    * readiness signal a caller can await. `connect`/`sleep` are
    * injectable for tests.
    *
    * On a PostgreSQL target the reference's EXTENSION-ADAPTIVE path is
    * replayed in its order (__init__.py:270-344):
    *
    *  - `pg_available_extensions` is probed once per start
    *    (__init__.py:273-278);
    *  - table creation with PostGIS available (and the location flag
    *    on) first runs `CREATE EXTENSION IF NOT EXISTS postgis CASCADE`
    *    and types the column `geometry(Point,4326)` — the reference's
    *    `Geometry("POINT", srid=4326)` (models.py:35,44 via
    *    activate_location_extraction, __init__.py:319-328); without
    *    PostGIS the column stays the WKT-text wire form
    *    ([[locationToWkt]] writes EWKT either way, which PostGIS casts
    *    implicitly);
    *  - with TimescaleDB available, creation is followed by
    *    `CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE` and
    *    `create_hypertable('<t>','time', if_not_exists => TRUE)`
    *    (__init__.py:330-344), and EVERY start — created or not —
    *    re-applies `set_chunk_time_interval` with the configured µs
    *    width (__init__.py:284-300; integer intervals are µs for
    *    timestamp partition columns). A pre-existing plain table under
    *    an available TimescaleDB logs the reference's
    *    "not a hypertable" warning instead of failing (__init__.py:
    *    292-299, the UndefinedTable tolerance).
    *
    * Returns the DDL actions taken (empty = nothing to do), so specs
    * and operators can assert the adaptive branch on record. */
  def bootstrapJdbc(
      cfg: LtssConfig,
      table: String = "ltss",
      attributesType: String = null,
      locationType: String = null,
      maxRetries: Int = 10,
      retryWaitMs: Long = 3000L,
      sleep: Long => Unit = Thread.sleep,
      connect: String => Connection = url => DriverManager.getConnection(url),
      log: String => Unit = m => System.err.println(m)): Seq[String] = {
    val (defAttrs, defLoc) = defaultTypesFor(cfg.dbUrl)
    val attrsType = Option(attributesType).getOrElse(defAttrs)
    var attempt = 0
    var conn: Connection = null
    while (conn == null) {
      try conn = connect(cfg.dbUrl)
      catch {
        case e: SQLException =>
          // the reference retries any connect failure; we retry only
          // connection-class errors and fail fast on non-transient ones
          // (bad URL, missing database, auth) — waiting can't fix those
          attempt += 1
          if (!isTransient(e) || attempt >= maxRetries) {
            // the give-up SURFACES before the throw — the analog of the
            // reference's persistent user notification ("LTSS could not
            // start, please check the log", __init__.py:141-153); the
            // rethrow is the readiness future's False
            log(s"[ltss-bootstrap] LTSS could not start: connection to " +
              s"'${cfg.dbUrl}' failed after $attempt attempt(s) — " +
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
            throw e
          }
          sleep(retryWaitMs)
      }
    }
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      def exec(sql: String): Unit = {
        val st = conn.createStatement()
        try st.execute(sql)
        finally st.close()
      }
      // one catalog probe per start, like the reference's dict
      // comprehension over pg_available_extensions — available ≠
      // installed; CREATE EXTENSION below does the installing
      val extensions: Set[String] =
        if (!postgresDialect(cfg.dbUrl)) Set.empty
        else {
          val st = conn.createStatement()
          try {
            val rs = st.executeQuery("SELECT name FROM pg_available_extensions")
            val out = scala.collection.mutable.Set.empty[String]
            try while (rs.next()) out += rs.getString(1)
            finally rs.close()
            out.toSet
          } finally st.close()
        }
      val postgis = extensions.contains("postgis")
      val timescale = extensions.contains("timescaledb")
      val locType = Option(locationType).getOrElse(
        if (postgis) "geometry(Point,4326)" else defLoc)
      // exact-name catalog probe (case variants cover folding dialects) —
      // not a full-catalog scan, and not fooled by same-named tables it
      // would never write to: getTables' name argument has LIKE
      // semantics, so an unescaped `_` in the table name matches ANY
      // character (`ltss_v2` ≙ `ltssXv2`) and a sibling's existence
      // would silently skip creation of the real table
      val (pat, schemaPat) = likePatterns(conn)
      def probe(name: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, schemaPat, pat(name), Array("TABLE"))
        try rs.next()
        finally rs.close()
      }
      val exists = probe(table) || probe(table.toUpperCase) || probe(table.toLowerCase)
      if (!exists) {
        if (postgis && cfg.enableLocation) {
          exec("CREATE EXTENSION IF NOT EXISTS postgis CASCADE")
          actions += "create_extension_postgis"
        }
        // location column only when the config enables it — the analog of
        // the reference's PostGIS-presence adaptivity (__init__.py:319-328)
        val locCol = if (cfg.enableLocation) s", location $locType" else ""
        exec(s"CREATE TABLE $table (" +
          "time TIMESTAMP NOT NULL, " +
          "entity_id VARCHAR(255) NOT NULL, " +
          "state VARCHAR(255), " +
          s"attributes $attrsType$locCol, " +
          "PRIMARY KEY (time, entity_id))")
        actions += "create_table"
        // the reference's create_all emits the table AND its two
        // indexes together (models.py:75-80) — creating them here keeps
        // a fresh table fully current, so the startup migration ladder
        // probes find nothing pending (it exists for LEGACY tables)
        if (postgresDialect(cfg.dbUrl)) {
          exec(s"CREATE INDEX ${table}_attributes_idx ON $table USING GIN (attributes)")
          actions += "attributes_index"
        }
        exec(s"CREATE INDEX ${table}_entityid_time_composite_idx " +
          s"ON $table (entity_id, time DESC)")
        actions += "entityid_time_composite_index"
        if (timescale) {
          exec("CREATE EXTENSION IF NOT EXISTS timescaledb CASCADE")
          actions += "create_extension_timescaledb"
          exec(s"SELECT create_hypertable('$table', 'time', if_not_exists => TRUE)")
          actions += "create_hypertable"
        }
      }
      if (timescale) {
        // chunk width is re-appliable after first setup — the one knob
        // the reference adjusts on EVERY start (__init__.py:284-290)
        try {
          exec(s"SELECT set_chunk_time_interval('$table', ${cfg.chunkTimeIntervalUs})")
          actions += "set_chunk_time_interval"
        } catch {
          case e: SQLException if e.getSQLState == "42P01" =>
            // UndefinedTable from inside set_chunk_time_interval: the
            // table exists but is NOT a hypertable — the reference logs
            // exactly this and carries on (__init__.py:292-299)
            log(s"[ltss-bootstrap] TimescaleDB is available but table " +
              s"'$table' is not a hypertable; chunk interval not applied")
        }
      }
      actions.toSeq
    } finally conn.close()
  }

  /** D2 — the reference's startup MIGRATION REPLAY (migrations.py:10-54),
    * re-expressed for the JDBC sink: inspect the live table and bring a
    * legacy deployment's schema to the current one, in the reference's
    * own order. Each step applies only when its probe finds the legacy
    * state, so a current table is a no-op and the call is idempotent —
    * run it at startup right after [[bootstrapJdbc]], exactly where the
    * reference calls `check_and_migrate` (__init__.py:257-263):
    *
    *  1. `attributes` stored as text → `ALTER … TYPE JSONB USING
    *     attributes::JSONB` (migrations.py:20-27,57-66);
    *  2. missing attributes GIN index → create
    *     `<table>_attributes_idx` (migrations.py:29-35,69-71 /
    *     models.py:47-50);
    *  3. missing composite index → create
    *     `<table>_entityid_time_composite_idx (entity_id, time DESC)`,
    *     then drop the superseded single-column `ix_<table>_entity_id`
    *     (migrations.py:37-46,74-85 / models.py:52-56);
    *  4. legacy surrogate `id` column → re-point the PRIMARY KEY at
    *     `(time, entity_id)` (CASCADE, one transaction) and drop the
    *     column (migrations.py:48-53,88-103).
    *
    * Returns the applied step names (empty = already current). With
    * `dryRun = true` nothing executes — the probes alone run and the
    * PENDING step names come back, the device ingest startup uses to
    * log what an un-opted-in table still needs (see
    * [[graft.config.LtssConfig.autoMigrate]]). Probes go
    * through `information_schema`/`pg_indexes` SQL — the same inspector
    * surface SQLAlchemy's `inspect(engine)` reads — filtered to the
    * connection's current schema so a same-named table elsewhere on the
    * search path can neither trigger nor suppress a step. Non-PostgreSQL
    * URLs return empty: every legacy state this replays was produced by
    * the reference, which only ever wrote PostgreSQL (models.py:27). */
  def checkAndMigrate(
      cfg: LtssConfig,
      table: String = "ltss",
      connect: String => Connection = url => DriverManager.getConnection(url),
      dryRun: Boolean = false,
      log: String => Unit = m => System.err.println(m)): Seq[String] = {
    if (!cfg.dbUrl.startsWith("jdbc:postgresql")) return Nil
    val applied = scala.collection.mutable.ArrayBuffer.empty[String]
    val conn = connect(cfg.dbUrl)
    try {
      def exec(sql: String): Unit = if (!dryRun) {
        val st = conn.createStatement(); try st.execute(sql) finally st.close()
      }
      def queryCol(sql: String): Seq[String] = {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          try while (rs.next()) out += rs.getString(1)
          finally rs.close()
          out.toSeq
        } finally st.close()
      }
      // TWO derivations of the folded name, one per SQL context: `tId`
      // stays RAW for identifier positions (qi doubles its embedded
      // double-quotes; a single quote passes through untouched), `t`
      // doubles single quotes for string-LITERAL positions (probe
      // WHERE clauses, catalog-name comparisons read back raw). Feeding
      // the literal-escaped form to qi would make DDL and probes
      // reference DIFFERENT names for a table containing a quote.
      val tId = table.toLowerCase
      val t = tId.replace("'", "''")
      // DDL identifiers are QUOTED forms of the same folded name the
      // probes use — unquoted `$table` interpolation would re-fold (or
      // break on) a name that needs quoting, and the quoted lowercase
      // form is identical to today's unquoted behavior for every name
      // bootstrapJdbc can have created
      def qi(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
      val qt = qi(tId)
      // (column, udt) pairs of the live table — one probe, reused by
      // steps 1 and 4, like the reference's single inspect() call
      val colUdt = queryCol(
        s"""SELECT column_name || ':' || udt_name FROM information_schema.columns
           | WHERE table_schema = current_schema() AND table_name = '$t'""".stripMargin)
        .map { kv => val Array(c, u) = kv.split(":", 2); c -> u }.toMap
      if (colUdt.isEmpty)
        throw new SQLException(s"checkAndMigrate: table $table does not exist", "42P01")
      def indexes: Set[String] = queryCol(
        s"""SELECT indexname FROM pg_indexes
           | WHERE schemaname = current_schema() AND tablename = '$t'""".stripMargin).toSet
      // 1. attributes text → JSONB (the reference warns "this might take
      // a couple of minutes" — a full-table rewrite, same here)
      if (colUdt.get("attributes").exists(u => u == "text" || u.startsWith("varchar"))) {
        exec(s"ALTER TABLE $qt ALTER COLUMN attributes TYPE JSONB " +
          "USING attributes::JSONB")
        applied += "attributes_text_to_jsonb"
      }
      // 2. attributes GIN index (after step 1: GIN's jsonb opclass
      // requires the migrated type, the order the reference relies on)
      if (!indexes.contains(s"${tId}_attributes_idx")) {
        exec(s"CREATE INDEX ${qi(s"${tId}_attributes_idx")} ON $qt USING GIN (attributes)")
        applied += "attributes_index"
      }
      // 3. composite (entity_id, time DESC) index; separately, the
      // obsolete per-column index the composite supersedes. The
      // reference nests the drop under the create (migrations.py:43-46),
      // which leaves the legacy index behind forever if a run crashes
      // between the two statements — probing each independently makes a
      // crashed ladder CONVERGE on re-run instead.
      if (!indexes.contains(s"${tId}_entityid_time_composite_idx")) {
        exec(s"CREATE INDEX ${qi(s"${tId}_entityid_time_composite_idx")} " +
          s"ON $qt (entity_id, time DESC)")
        applied += "entityid_time_composite_index"
      }
      if (indexes.contains(s"ix_${tId}_entity_id")) {
        exec(s"DROP INDEX ${qi(s"ix_${tId}_entity_id")}")
        applied += "drop_entityid_index"
      }
      // 4. surrogate id column → composite PK, then drop the column.
      // One transaction, as in the reference (engine.begin()): a crash
      // between the PK swap and the column drop must not strand the
      // table PK-less or doubly-keyed. The PK constraint is dropped BY
      // ITS CATALOG NAME, not the `<table>_pkey` the reference assumes
      // (migrations.py:91) — a table that was ever RENAMED keeps its
      // original constraint name, and `DROP ... IF EXISTS <wrong>_pkey`
      // would silently no-op before ADD PRIMARY KEY fails with
      // "multiple primary keys". The catalog lookups join through
      // pg_class/pg_namespace pinned to current_schema() — a bare
      // `'$t'::regclass` resolves via the search path, so a same-named
      // table earlier on it would hand back the WRONG constraint name.
      if (colUdt.contains("id")) {
        val pkName = queryCol(
          s"""SELECT con.conname FROM pg_constraint con
             | JOIN pg_class c ON c.oid = con.conrelid
             | JOIN pg_namespace n ON n.oid = c.relnamespace
             | WHERE n.nspname = current_schema() AND c.relname = '$t'
             |   AND con.contype = 'p'""".stripMargin)
          .headOption.getOrElse(s"${tId}_pkey")
        // CASCADE mirrors the reference (migrations.py:91) but is not
        // silent about it: any foreign key in OTHER tables that
        // references this PK goes down with it — surface each one
        // before the drop so an operator can see what the migration
        // took (and a dry run can warn about it without touching
        // anything).
        val cascaded = queryCol(
          s"""SELECT rc.relname || '.' || con.conname
             | FROM pg_constraint con
             | JOIN pg_class rc ON rc.oid = con.conrelid
             | JOIN pg_class c ON c.oid = con.confrelid
             | JOIN pg_namespace n ON n.oid = c.relnamespace
             | WHERE n.nspname = current_schema() AND c.relname = '$t'
             |   AND con.contype = 'f'
             | ORDER BY 1""".stripMargin)
        if (cascaded.nonEmpty)
          log(s"[ltss-migrate] dropping PK '$pkName' on $tId CASCADEs these " +
            s"referencing foreign keys: ${cascaded.mkString(", ")}")
        if (!dryRun) {
          conn.setAutoCommit(false)
          try {
            exec(s"ALTER TABLE $qt " +
              s"DROP CONSTRAINT IF EXISTS ${qi(pkName)} CASCADE, " +
              "ADD PRIMARY KEY (time, entity_id)")
            exec(s"ALTER TABLE $qt DROP COLUMN id")
            conn.commit()
          } catch { case e: Throwable => conn.rollback(); throw e }
          finally conn.setAutoCommit(true)
        }
        applied += "remove_id_column"
      }
      applied.toSeq
    } finally conn.close()
  }

  /** LIKE-pattern hygiene for the JDBC catalog probes: an escaper for
    * the `_`/`%` wildcards (using the driver's own escape string) and
    * the connection's current schema as the schema pattern, so a probe
    * for table X matches exactly X in exactly the schema writes go to.
    * Drivers that support neither call (the test-scope wire client
    * throws on unimplemented metadata methods) degrade to the
    * unconstrained probe rather than failing startup. */
  private def likePatterns(conn: Connection): (String => String, String) = {
    val esc =
      try Option(conn.getMetaData.getSearchStringEscape).filter(_.nonEmpty)
      catch { case _: Exception => None }
    def pat(s: String): String = esc match {
      case Some(e) =>
        s.replace(e, e + e).replace("_", e + "_").replace("%", e + "%")
      case None => s
    }
    val schemaPat =
      try Option(conn.getSchema).map(pat).orNull
      catch { case _: Exception => null }
    (pat, schemaPat)
  }

  /** LOCATION-COLUMN RE-DETECTION — the reference's startup adaptivity
    * (`__init__.py:303-308` introspects the live table's columns every
    * start; `models.py:38-43`: once location is activated it cannot be
    * deactivated): for an EXISTING table the stored schema overrides
    * the configured `enableLocation` in both directions — a table with
    * the column keeps receiving locations even if the config dropped
    * the flag (no silent column starvation), and a table without it
    * never gets location writes the DDL can't hold (the reference adds
    * the column only at first creation, never by migration). A missing
    * table returns the config unchanged — creation follows it. */
  def effectiveConfig(
      cfg: LtssConfig,
      table: String = "ltss",
      connect: String => Connection = url => DriverManager.getConnection(url)): LtssConfig = {
    val conn = connect(cfg.dbUrl)
    try {
      // getColumns' name arguments are LIKE patterns: an unescaped `_`
      // in the table name matches ANY character (`ltss_v2` ≙ `ltssXv2`),
      // and a null schema merges same-named tables from every schema
      // into one column set — either can wrongly flip enableLocation.
      val (pat, schemaPat) = likePatterns(conn)
      def columnsOf(name: String): Set[String] = {
        val rs = conn.getMetaData.getColumns(null, schemaPat, pat(name), null)
        val out = scala.collection.mutable.Set.empty[String]
        try while (rs.next()) out += rs.getString("COLUMN_NAME").toLowerCase
        finally rs.close()
        out.toSet
      }
      val cols = Seq(table, table.toUpperCase, table.toLowerCase)
        .iterator.map(columnsOf).find(_.nonEmpty).getOrElse(Set.empty)
      if (cols.isEmpty) cfg
      else cfg.copy(enableLocation = cols.contains("location"))
    } finally conn.close()
  }

  /** JDBC append with the reference's retry envelope (≤10 tries, 3 s —
    * __init__.py:53,201-244). Transient (connection-class) failures retry
    * the whole batch. Once retries are exhausted — or on a non-transient
    * error — the default is to RETHROW so a streaming caller's checkpoint
    * does not advance past lost data (at-least-once); `dropOnFailure =
    * true` opts into the reference's log-and-drop behavior
    * (__init__.py:229-235) for callers that prefer availability.
    *
    * INTEGRITY violations (SQLState 23xxx — duplicate PK) are the
    * expected face of at-least-once + the `(time, entity_id)` PK: a
    * replayed batch re-inserting committed rows (reference
    * drop-on-PK-conflict, __init__.py:229-231). A conflict does NOT mean
    * the whole batch is committed — Spark's JDBC writer commits per
    * PARTITION, so an earlier attempt may have committed only some
    * partitions. On conflict the batch is ANTI-JOINED against the rows
    * already in the table for its (time) key range and the remainder is
    * retried — the checkpoint advances only once every partition's rows
    * are durable, never past lost data. */
  def writeJdbc(
      ltss: DataFrame,
      cfg: LtssConfig,
      table: String = "ltss",
      maxRetries: Int = 10,
      retryWaitMs: Long = 3000L,
      sleep: Long => Unit = Thread.sleep,
      dropOnFailure: Boolean = false,
      maxConflictRounds: Int = 3,
      bulkCopy: Boolean = false,
      copyFormat: String = "text"): Unit = {
    var attempt = 0
    var conflictRounds = 0
    var batch = ltss
    var done = false
    while (!done) {
      try {
        // bulkCopy (PostgreSQL only): the COPY protocol per partition —
        // the production bulk path ([[copyIntoPg]]); it handles PK
        // replays internally via the same ON CONFLICT machinery, so
        // only transient/fatal errors reach the envelope below.
        // Semantics (at-least-once, conflict-skip, retry classes) are
        // identical to the INSERT path — measured vs it on live PG 15.
        if (bulkCopy && postgresDialect(cfg.dbUrl))
          copyIntoPg(batch, cfg.dbUrl, table, format = copyFormat)
        else batch.write
          .mode(SaveMode.Append)
          .option("batchsize", 1000)
          .jdbc(cfg.dbUrl, table, new java.util.Properties())
        done = true
      } catch {
        case e: Exception if isConflict(e) && postgresDialect(cfg.dbUrl) =>
          // Postgres fast path (the reference's actual target,
          // __init__.py:229-231): one batched
          // `INSERT ... ON CONFLICT DO NOTHING` statement lands the
          // not-yet-committed remainder — the database skips committed
          // PKs itself, so there is no key read-back and no
          // key-comparability trap (timestamp precision, collation).
          // A batch that duplicates its OWN PK keeps its first row and
          // silently skips the rest — exactly the reference's
          // drop-on-conflict. The anti-join replay below remains the
          // generic-dialect fallback.
          System.err.println(
            s"[ltss-sink] PK conflict (replayed batch) — landing the remainder via " +
              s"ON CONFLICT DO NOTHING: ${e.getMessage}")
          insertIgnoreConflicts(batch, cfg.dbUrl, table, " ON CONFLICT DO NOTHING")
          done = true
        case e: Exception if isConflict(e) =>
          if (conflictRounds >= maxConflictRounds) {
            // exhausted rounds mean the anti-join keeps failing to match
            // the committed rows — almost always a key-comparability gap
            // between Spark and the target (timestamp precision
            // truncation, entity_id collation/case folding) or a batch
            // that conflicts within itself. Default is a deliberate LOUD
            // failure rather than the old conflict-means-committed
            // assumption (which silently dropped uncommitted
            // partitions); fix the key round-trip (µs-precision
            // timestamps, binary collation) or dedup the batch by PK
            // before the sink. dropOnFailure keeps its availability
            // contract and drops the batch with a log line instead.
            if (dropOnFailure) {
              System.err.println(
                s"[ltss-sink] dropping batch after $maxConflictRounds conflict rounds " +
                  s"(dropOnFailure): ${e.getMessage}")
              done = true
            } else throw new IllegalStateException(
              s"PK conflicts persisted after $maxConflictRounds remainder retries — " +
                "the (time, entity_id) keys read back from the database do not match " +
                "the batch's (timestamp precision? collation?), or the batch " +
                "duplicates its own PKs. Not advancing past possibly-lost data.", e)
          } else {
            conflictRounds += 1
            System.err.println(
              s"[ltss-sink] PK conflict (replayed batch) — retrying the not-yet-committed " +
                s"remainder (round $conflictRounds): ${e.getMessage}")
            batch = withoutCommittedRows(batch, cfg, table)
          }
        case e: Exception if attempt < maxRetries && isTransient(e) =>
          attempt += 1; sleep(retryWaitMs)
        case e: Exception =>
          if (dropOnFailure) {
            System.err.println(
              s"[ltss-sink] dropping batch after $attempt retries: ${e.getMessage}")
            done = true
          } else throw e
      }
    }
  }

  /** UPSERT path — the LATE-CORRECTION / BACKFILL write the
    * append-only ingest deliberately lacks: re-delivered state for an
    * existing PK `(time, entity_id)` OVERWRITES the stored row
    * (`INSERT … ON CONFLICT (time, entity_id) DO UPDATE SET
    * col = EXCLUDED.col` for every non-key column). This is what a
    * migration replay or a corrected-sensor backfill needs where the
    * ingest's DO NOTHING would silently keep the stale row. The batch
    * is PK-deduped first ([[graft.operators.Transform.dedupByPk]],
    * newest state wins) because PostgreSQL rejects a single DO UPDATE
    * statement touching one PK twice (21000 cardinality_violation) —
    * and a batch that intends two corrections for one PK has an
    * ordering question the deterministic min-struct survivor rule
    * answers reproducibly (first by state, then remaining columns,
    * exactly the `ltss_dedup_pk` invariant). PostgreSQL-only by
    * design: the generic dialect has no atomic single-statement upsert,
    * and a delete-then-insert emulation would silently drop rows on a
    * mid-flight failure — refused loudly instead. Executor-side shape
    * is [[insertIgnoreConflicts]]'s: one connection and ONE prepared
    * statement per partition, 1000-row batches. */
  def upsertJdbc(ltss: DataFrame, cfg: LtssConfig, table: String = "ltss"): Unit = {
    require(postgresDialect(cfg.dbUrl),
      "upsertJdbc needs PostgreSQL's ON CONFLICT DO UPDATE — for another " +
        "dialect, dedup against the stored keys and use writeJdbc, or " +
        "route corrections through a staging table merge")
    val deduped = graft.operators.Transform.dedupByPk(
      ltss, Seq(org.apache.spark.sql.functions.col("state")))
    val nonKey = deduped.columns.filterNot(c => c == "time" || c == "entity_id")
    val suffix = s" ON CONFLICT (time, entity_id) DO UPDATE SET " +
      nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    insertIgnoreConflicts(deduped, cfg.dbUrl, table, suffix)
  }

  /** The sink dialect whose conflict handling the database can do itself. */
  private[graft] def postgresDialect(url: String): Boolean =
    url.startsWith("jdbc:postgresql:")

  /** The conflict-tolerant insert statement: every column of the batch,
    * positional binds, dialect suffix appended (Postgres:
    * ` ON CONFLICT DO NOTHING`). */
  private[graft] def insertSql(table: String, cols: Seq[String], suffix: String): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})$suffix"

  /** Executor-side conflict-tolerant append: each partition opens one
    * connection and drives ONE prepared statement in 1000-row batches.
    * With the Postgres suffix the statement never conflicts — the
    * database skips committed PKs. On a dialect whose suffix cannot
    * express that (the embedded-Derby tests pass ""), a chunk that hits
    * an integrity violation is replayed row-by-row swallowing per-row
    * conflicts — same semantics, used only where the one-statement form
    * is unavailable. */
  private[graft] def insertIgnoreConflicts(
      batch: DataFrame, url: String, table: String, suffix: String): Unit = {
    val cols = batch.columns.toIndexedSeq
    val sql = insertSql(table, cols, suffix)
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = DriverManager.getConnection(url)
      try insertRowsIgnoreConflicts(conn, sql, cols.length, rows)
      finally conn.close()
    }
  }

  /** The executor-side body of [[insertIgnoreConflicts]], factored so
    * the COPY path's conflict fallback drives the SAME machinery on an
    * already-open connection. */
  private def insertRowsIgnoreConflicts(
      conn: Connection, sql: String, nCols: Int,
      rows: Iterator[org.apache.spark.sql.Row]): Unit = {
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement(sql)
    try {
      val chunk = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      def flush(): Unit = if (chunk.nonEmpty) {
        chunk.foreach { r =>
          (0 until nCols).foreach(i => ps.setObject(i + 1, r.get(i)))
          ps.addBatch()
        }
        try ps.executeBatch()
        catch {
          case e: SQLException if isConflict(e) =>
            // no ON CONFLICT on this dialect: replay the chunk one
            // row at a time, skipping only the conflicting rows.
            // Each row runs under a SAVEPOINT: PostgreSQL (and any
            // abort-on-error dialect) poisons the whole transaction
            // at the first constraint violation — every later
            // statement fails 25P02 in_failed_sql_transaction, not
            // 23xxx — so a bare executeUpdate loop would drop the
            // entire remainder. ROLLBACK TO SAVEPOINT restores the
            // transaction to live after each conflicting row;
            // statement-level recovery has no other portable form.
            // (Derby tolerates mid-transaction violations, which is
            // why the Derby suite alone never caught this — the
            // real-PostgreSQL e2e spec does.)
            ps.clearBatch()
            conn.rollback()
            chunk.foreach { r =>
              (0 until nCols).foreach(i => ps.setObject(i + 1, r.get(i)))
              val sp = conn.setSavepoint()
              try { ps.executeUpdate(); conn.releaseSavepoint(sp) }
              catch {
                case e2: SQLException if isConflict(e2) => conn.rollback(sp)
              }
            }
        }
        conn.commit()
        chunk.clear()
      }
      rows.foreach { r =>
        chunk += r
        if (chunk.size >= 1000) flush()
      }
      flush()
    } finally {
      ps.close()
      conn.setAutoCommit(prevAutoCommit)
    }
  }

  /** The COPY-IN surface of a connection, if any: the pgjdbc
    * `PGConnection.getCopyAPI.copyIn(sql, reader)` chain reached
    * reflectively (production; no compile-time pgjdbc dependency), or
    * a driver implementing [[PgCopy]] directly (the sandbox's wire
    * client). `None` = this connection cannot COPY. */
  private[graft] def copyApiOf(conn: Connection): Option[(String, java.io.Reader) => Long] =
    conn match {
      case c: PgCopy => Some((sql, r) => c.copyIn(sql, r))
      case _ =>
        try {
          // resolve against the CONNECTION's loader: that is where the
          // driver (and so the interface) is guaranteed to live, even
          // when pgjdbc is isolated from the application classloader
          val pgIface = Class.forName(
            "org.postgresql.PGConnection", false, conn.getClass.getClassLoader)
          if (conn.isWrapperFor(pgIface)) {
            val pg = conn.unwrap(pgIface)
            val mgr = pgIface.getMethod("getCopyAPI").invoke(pg)
            val m = mgr.getClass.getMethod(
              "copyIn", classOf[String], classOf[java.io.Reader])
            // unwrap the reflection envelope: Method.invoke wraps the
            // server's SQLException in InvocationTargetException, which
            // would never match copyIntoPg's `case e: SQLException if
            // isConflict(e)` chunk fallback — the production pgjdbc
            // path must surface the same exception type the direct
            // PgCopy path throws
            Some { (sql, r) =>
              try m.invoke(mgr, sql, r).asInstanceOf[java.lang.Long].longValue()
              catch {
                case e: java.lang.reflect.InvocationTargetException =>
                  throw Option(e.getCause).getOrElse(e)
              }
            }
          } else None
        } catch { case _: Exception => None }
    }

  /** The BINARY COPY surface of a connection: a [[PgCopy]] driver's
    * `copyInBinary`, or pgjdbc's `CopyManager.copyIn(sql, InputStream)`
    * reached reflectively with the same InvocationTargetException
    * unwrapping as [[copyApiOf]]. `None` = text tier only. */
  private[graft] def copyBinaryApiOf(
      conn: Connection): Option[(String, java.io.InputStream) => Long] =
    conn match {
      case c: PgCopy => Some((sql, in) => c.copyInBinary(sql, in))
      case _ =>
        try {
          val pgIface = Class.forName(
            "org.postgresql.PGConnection", false, conn.getClass.getClassLoader)
          if (conn.isWrapperFor(pgIface)) {
            val pg = conn.unwrap(pgIface)
            val mgr = pgIface.getMethod("getCopyAPI").invoke(pg)
            val m = mgr.getClass.getMethod(
              "copyIn", classOf[String], classOf[java.io.InputStream])
            Some { (sql, in) =>
              try m.invoke(mgr, sql, in).asInstanceOf[java.lang.Long].longValue()
              catch {
                case e: java.lang.reflect.InvocationTargetException =>
                  throw Option(e.getCause).getOrElse(e)
              }
            }
          } else None
        } catch { case _: Exception => None }
    }

  /** Per-column BINARY field encoders for `cols` of the LIVE table,
    * derived from the server's own catalog (binary COPY field bytes
    * feed each column TYPE's `recv` function, so the encoding must
    * match the column as CREATED, not as this writer guesses — a
    * JSONB column needs its version byte, a VARCHAR must not get one).
    * `None` when any column's type has no encoder here — the caller
    * degrades to the text tier, which is escape-complete for
    * everything. Timestamps: PG binary timestamps are µs since
    * 2000-01-01; `timestamp` (no tz) takes the WALL CLOCK in the JVM
    * default zone — the same rendering `Timestamp.toString` feeds the
    * text tier — and `timestamptz` takes UTC instant µs. */
  private[graft] def pgBinaryEncoders(
      conn: Connection, table: String, cols: Seq[String])
      : Option[IndexedSeq[(Any, java.io.DataOutputStream) => Unit]] = {
    // the lookup must name ONE relation: without a schema filter a
    // same-named table in another schema makes the types map
    // last-row-wins per column, and a wrong encoder corrupts stored
    // bytes (e.g. a jsonb version byte prepended into a text column).
    // A qualified "schema.table" argument filters on its own schema;
    // a bare name filters on current_schema() — the relation COPY will
    // actually hit via the search path. Any column still seen twice
    // with conflicting types is ambiguous → None (text tier, which is
    // catalog-independent).
    val (schemaFilter, rel) = table.split("\\.") match {
      case Array(sch, t) => ("table_schema = ?", t)
      case _ => ("table_schema = current_schema()", table)
    }
    val types = scala.collection.mutable.Map.empty[String, String]
    var ambiguous = false
    val ps = conn.prepareStatement(
      "SELECT column_name, data_type FROM information_schema.columns " +
        s"WHERE table_name = ? AND $schemaFilter")
    try {
      ps.setString(1, rel.stripPrefix("\"").stripSuffix("\"").toLowerCase)
      if (schemaFilter.endsWith("?")) {
        val sch = table.split("\\.")(0)
        // strip quoting if the caller wrote "sch"."t"
        ps.setString(2, sch.stripPrefix("\"").stripSuffix("\"").toLowerCase)
      }
      val rs = ps.executeQuery()
      while (rs.next()) {
        val c = rs.getString(1).toLowerCase
        val t = rs.getString(2)
        if (types.get(c).exists(_ != t)) ambiguous = true
        types(c) = t
      }
      rs.close()
    } finally ps.close()
    if (ambiguous) return None
    val PgEpochUs = 946684800000000L // 2000-01-01T00:00:00Z in epoch µs
    def utf8(v: Any, out: java.io.DataOutputStream): Unit = {
      val b = v.toString.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    }
    def micros(v: Any, utc: Boolean): Long = {
      val ts = v.asInstanceOf[java.sql.Timestamp]
      val us =
        if (utc)
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        else {
          val ldt = ts.toLocalDateTime
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L
        }
      us - PgEpochUs
    }
    val encs = cols.map { c =>
      types.get(c.toLowerCase).flatMap {
        case "character varying" | "text" | "character" =>
          Some(utf8 _)
        case "json" =>
          Some(utf8 _)
        case "jsonb" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            val b = v.toString.getBytes("UTF-8")
            out.writeInt(b.length + 1); out.writeByte(1); out.write(b)
          }
        case "timestamp without time zone" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(8); out.writeLong(micros(v, utc = false))
          }
        case "timestamp with time zone" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(8); out.writeLong(micros(v, utc = true))
          }
        case "bigint" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(8); out.writeLong(v.asInstanceOf[Number].longValue())
          }
        case "integer" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(4); out.writeInt(v.asInstanceOf[Number].intValue())
          }
        case "double precision" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(8); out.writeDouble(v.asInstanceOf[Number].doubleValue())
          }
        case "boolean" =>
          Some { (v: Any, out: java.io.DataOutputStream) =>
            out.writeInt(1); out.writeByte(if (v.asInstanceOf[Boolean]) 1 else 0)
          }
        case _ => None
      }
    }
    if (encs.exists(_.isEmpty)) None else Some(encs.map(_.get).toIndexedSeq)
  }

  /** One COPY binary payload for a chunk of rows: the PGCOPY header
    * (signature, flags 0, no extension), per tuple an int16 field
    * count then length-prefixed fields (−1 = NULL), and the int16 −1
    * trailer — one complete payload per `COPY … (FORMAT binary)`
    * statement. */
  private[graft] def copyBinaryChunk(
      rows: Seq[org.apache.spark.sql.Row],
      encs: IndexedSeq[(Any, java.io.DataOutputStream) => Unit]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(rows.length * 64 + 32)
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y', '\n',
      0xFF.toByte, '\r', '\n', 0x00))
    out.writeInt(0) // flags
    out.writeInt(0) // header extension length
    val n = encs.length
    rows.foreach { r =>
      out.writeShort(n)
      var i = 0
      while (i < n) {
        val v = r.get(i)
        if (v == null) out.writeInt(-1) else encs(i)(v, out)
        i += 1
      }
    }
    out.writeShort(-1) // trailer
    out.flush()
    bos.toByteArray
  }

  /** One row as a COPY text-format line: tab-separated fields, `\N`
    * for SQL NULL, the four text-format escapes (backslash, tab,
    * newline, carriage return) applied to string renderings.
    * Timestamps render through `toString` (µs survive — the same
    * round-trip the wire client's literal uses). */
  private[graft] def copyTextLine(
      r: org.apache.spark.sql.Row, nCols: Int, sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < nCols) {
      if (i > 0) sb.append('\t')
      val v = r.get(i)
      if (v == null) sb.append("\\N")
      else {
        val s = v.toString
        var j = 0
        while (j < s.length) {
          s.charAt(j) match {
            case '\\' => sb.append("\\\\")
            case '\t' => sb.append("\\t")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case c => sb.append(c)
          }
          j += 1
        }
      }
      i += 1
    }
    sb.append('\n')
  }

  /** PostgreSQL COPY bulk load — the production ingest path on a real
    * cluster (the reference commits one row per INSERT transaction,
    * `__init__.py:207-218`; batched INSERT beats that ~50×, COPY beats
    * batched INSERT again by skipping per-row statement overhead —
    * both measured on live PG 15 in `PostgresE2ESpec`). Per partition:
    * one connection, the partition streamed in bounded CHUNKS of COPY
    * text (memory = one chunk, never the partition), each chunk one
    * `COPY … FROM STDIN` statement. COPY cannot express ON CONFLICT,
    * so a chunk whose load hits the `(time, entity_id)` PK (a replayed
    * batch — the expected face of at-least-once) falls back to the
    * SAME conflict-tolerant insert machinery the vanilla path uses
    * (`ON CONFLICT DO NOTHING` + savepoint replay), preserving
    * exactly-once lands chunk by chunk; semantics are identical to the
    * INSERT path, only the happy-path syscall count changes. A
    * connection with no COPY surface degrades to that machinery for
    * the whole partition. */
  private[graft] def copyIntoPg(
      batch: DataFrame, url: String, table: String, chunkRows: Int = 10000,
      format: String = "text"): Unit = {
    require(format == "text" || format == "binary",
      s"copyIntoPg format must be 'text' or 'binary', got '$format'")
    val cols = batch.columns.toIndexedSeq
    val copySql = s"COPY $table (${cols.mkString(", ")}) FROM STDIN"
    val copyBinSql = s"$copySql WITH (FORMAT binary)"
    val fallbackSql = insertSql(table, cols, " ON CONFLICT DO NOTHING")
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val conn = DriverManager.getConnection(url)
      try {
        // binary tier: needs BOTH a byte-stream COPY surface and a
        // full set of catalog-derived field encoders; anything missing
        // degrades to the text tier below (escape-complete, portable)
        val binary: Option[((String, java.io.InputStream) => Long,
          IndexedSeq[(Any, java.io.DataOutputStream) => Unit])] =
          if (format != "binary") None
          else for {
            api <- copyBinaryApiOf(conn)
            encs <- pgBinaryEncoders(conn, table, cols)
          } yield (api, encs)
        (copyApiOf(conn), binary) match {
          case (None, None) =>
            // no COPY on this connection: the whole partition lands
            // through the conflict-tolerant insert machinery
            insertRowsIgnoreConflicts(conn, fallbackSql, cols.length, rows)
          case (text, bin) =>
            val chunk = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
            // the binary tier can be refused AT CALL TIME: PgCopy's
            // default copyInBinary throws 0A000 (feature not supported),
            // as would a server without binary COPY — the documented
            // contract is DEGRADE to the text tier, not fail the write,
            // so the first 0A000 turns binary off for this partition
            // and replays the chunk through text (nothing landed: the
            // refused COPY statement never consumed rows)
            var binTier = bin
            def copyChunk(): Unit = binTier match {
              case Some((copyB, encs)) =>
                try copyB(copyBinSql,
                  new java.io.ByteArrayInputStream(copyBinaryChunk(chunk.toSeq, encs)))
                catch {
                  case e: SQLException if e.getSQLState == "0A000" && text.isDefined =>
                    binTier = None
                    copyChunk()
                }
              case None =>
                val sb = new java.lang.StringBuilder(chunk.length * 64)
                chunk.foreach(copyTextLine(_, cols.length, sb))
                text.get(copySql, new java.io.StringReader(sb.toString))
            }
            def flush(): Unit = if (chunk.nonEmpty) {
              try copyChunk()
              catch {
                case e: SQLException if isConflict(e) =>
                  // replayed rows in THIS chunk: the database skips
                  // committed PKs itself via the insert fallback
                  insertRowsIgnoreConflicts(
                    conn, fallbackSql, cols.length, chunk.iterator)
              }
              chunk.clear()
            }
            rows.foreach { r =>
              chunk += r
              if (chunk.size >= chunkRows) flush()
            }
            flush()
        }
      } finally conn.close()
    }
  }

  /** The batch minus rows whose `(time, entity_id)` PK already exists in
    * the table — the replay-safe remainder after a PK conflict. The
    * existing-key read is bounded to the batch's time range (the
    * predicate pushes down to the database, so at scale this reads one
    * chunk's keys, not the table). */
  private def withoutCommittedRows(
      batch: DataFrame, cfg: LtssConfig, table: String): DataFrame = {
    val spark = batch.sparkSession
    val bounds = batch.agg(min(col("time")).as("lo"), max(col("time")).as("hi")).head()
    if (bounds.isNullAt(0)) return batch // empty batch
    val existing = spark.read.jdbc(cfg.dbUrl, table, new java.util.Properties())
      .filter(col("time").between(lit(bounds.getTimestamp(0)), lit(bounds.getTimestamp(1))))
      .select(col("time"), col("entity_id"))
    batch.join(existing, Seq("time", "entity_id"), "left_anti")
  }

  /** Integrity-constraint violations (duplicate PK on replay). Walks the
    * cause chain AND each SQLException's `getNextException` chain — a
    * `BatchUpdateException` (batched insert) reports the real
    * duplicate-key error through the latter, not through the cause. */
  private[graft] def isConflict(t: Throwable): Boolean = {
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 10) {
      cur match {
        case e: SQLException =>
          var se: SQLException = e
          var d2 = 0
          while (se != null && d2 < 10) {
            if (se.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
              Option(se.getSQLState).exists(_.startsWith("23"))) return true
            se = se.getNextException
            d2 += 1
          }
        case _ => ()
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }

  /** Connection-level failures the reference treats as OperationalError.
    * Executor-side failures surface wrapped in SparkException — walk the
    * cause chain to find the SQLException that classifies them. */
  private[graft] def isTransient(t: Throwable): Boolean = {
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 10) {
      cur match {
        case _: java.sql.SQLTransientException => return true
        case e: SQLException =>
          val s = Option(e.getSQLState).getOrElse("")
          if (s.startsWith("08") || s.startsWith("53") || s == "57P03") return true
        case _ => ()
      }
      cur = cur.getCause
      depth += 1
    }
    false
  }
}
