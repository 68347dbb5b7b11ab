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
}
