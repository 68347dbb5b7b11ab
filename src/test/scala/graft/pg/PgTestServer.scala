package graft.pg

import java.nio.file.{Files, Paths}

/** Boots a REAL PostgreSQL server for the e2e spec, from the binaries
  * the sandbox image ships (`/usr/local/bin/initdb`, `pg_ctl`,
  * `postgres` — PostgreSQL 15). Mirrors the reference project's own
  * test spine, which boots real database containers per capability
  * combo (reference tests/pytest/test_databases.py:20-45,
  * tests/bats/test_integration.bats:58-148) — no Docker exists here, so
  * the cluster is initdb'd fresh under /tmp and run via `pg_ctl`.
  *
  * PostgreSQL refuses to run as root; when the JVM is root (the CI
  * sandbox), every server command is wrapped in
  * `su postgres -s /bin/bash -c …` against the image's `postgres`
  * user, with the data directory chowned over first. Auth is `trust`
  * on 127.0.0.1 only, fsync off — a throwaway test cluster.
  *
  * `start()` returns Left(reason) when the environment genuinely can't
  * host a server (no binaries, no postgres user, startup failure) —
  * the spec turns that into canceled-with-reason tests rather than
  * false greens. */
object PgTestServer {

  final case class Server(port: Int, dir: String) {
    def url: String = s"jdbc:postgresql://127.0.0.1:$port/postgres"
    def wire(): PgWire.Conn = new PgWire.Conn("127.0.0.1", port, "postgres", "postgres")
    def stop(): Unit = {
      run(s"$Bin/pg_ctl -D $dir/data -m immediate stop", asPostgres = true)
      deleteRecursively(new java.io.File(dir))
    }
  }

  private val Bin = "/usr/local/bin"

  private def run(cmd: String, asPostgres: Boolean): (Int, String) = {
    val full =
      if (asPostgres && isRoot) Seq("su", "postgres", "-s", "/bin/bash", "-c", cmd)
      else Seq("/bin/bash", "-c", cmd)
    val pb = new ProcessBuilder(full: _*)
    pb.directory(new java.io.File("/tmp")) // a cwd the postgres user can read
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    p.waitFor()
    (p.exitValue(), out)
  }

  private def isRoot: Boolean =
    scala.util.Try(new ProcessBuilder("id", "-u").start())
      .map { p => new String(p.getInputStream.readAllBytes()).trim == "0" }
      .getOrElse(false)

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  def start(): Either[String, Server] = {
    if (!Files.exists(Paths.get(s"$Bin/initdb")))
      return Left(s"$Bin/initdb not present — no PostgreSQL binaries in this environment")
    val (idRc, _) = run("id -u postgres", asPostgres = false)
    if (isRoot && idRc != 0)
      return Left("running as root and no 'postgres' user exists to drop to")
    val dir = Files.createTempDirectory("graft-pg-").toString
    if (isRoot) {
      val (rc, out) = run(s"chown -R postgres:postgres $dir", asPostgres = false)
      if (rc != 0) return Left(s"chown failed: $out")
    }
    val (initRc, initOut) = run(
      s"$Bin/initdb -D $dir/data -U postgres --auth=trust --no-sync", asPostgres = true)
    if (initRc != 0) return Left(s"initdb failed: ${initOut.takeRight(500)}")
    val port = freePort()
    val opts = s"-p $port -c listen_addresses=127.0.0.1 " +
      s"-c unix_socket_directories=$dir -c fsync=off -c synchronous_commit=off"
    val (startRc, startOut) = run(
      s"$Bin/pg_ctl -D $dir/data -l $dir/server.log -o '$opts' -w start", asPostgres = true)
    if (startRc != 0) return Left(s"pg_ctl start failed: ${startOut.takeRight(500)}")
    Right(Server(port, dir))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
