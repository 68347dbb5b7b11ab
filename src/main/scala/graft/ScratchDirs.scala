package graft

/** Per-JVM scratch locations for queries that materialize an index/layout
  * (IVF assignment, chunked LTSS layout). The nonce keeps concurrent
  * sessions from overwriting each other's layout mid-read; within one JVM
  * the path is stable, so a session's Overwrite-then-read is consistent. */
object ScratchDirs {
  private val nonce = java.util.UUID.randomUUID().toString.take(8)

  def path(tag: String, datasetDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${nonce}_" +
      datasetDir.replaceAll("[^a-zA-Z0-9]", "_")

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Path for (tag, dataset) whose layout is materialized ONCE per JVM:
    * `write` runs only on the first request, later callers get the
    * already-built path. Queries that demonstrate a pruned READ of a
    * layout (chunk scan, IVF probe) memoize through this so repeated
    * invocations measure the read, not a rewrite — at scale the layout
    * is pre-materialized by ingest, not rebuilt per query. */
  def materializedPath(tag: String, datasetDir: String)(write: String => Unit): String =
    built.computeIfAbsent(s"$tag|$datasetDir", { _ =>
      val p = path(tag, datasetDir)
      write(p)
      p
    })
}
