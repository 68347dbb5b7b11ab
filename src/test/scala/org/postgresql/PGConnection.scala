package org.postgresql

/** TEST-SCOPE stand-in for the pgjdbc extension interface of the same
  * fully-qualified name. `LtssSink.copyApiOf` discovers the production
  * COPY surface reflectively via `Class.forName("org.postgresql
  * .PGConnection")` — no compile-time pgjdbc dependency — so this
  * 1-method twin lets the test suite drive the REAL reflective branch
  * (interface probe, unwrap, `getCopyAPI`, `copyIn` dispatch, and the
  * InvocationTargetException unwrapping) without the driver jar. Only
  * the member `copyApiOf` touches is declared. */
trait PGConnection {
  def getCopyAPI: AnyRef
}

/** Public top-level fake of pgjdbc's CopyManager shape: any object with
  * a public `copyIn(String, Reader): Long` satisfies `copyApiOf`'s
  * `getClass.getMethod` lookup (top-level so `Method.invoke` has
  * access). `failState = Some(sqlstate)` makes every call throw that
  * SQLException — the server-conflict face; `None` returns the fed
  * character count — the happy face. */
class FakeCopyManager(failState: Option[String]) {
  var calls: Int = 0
  def copyIn(sql: String, r: java.io.Reader): Long = {
    calls += 1
    failState.foreach { s =>
      throw new java.sql.SQLException(
        "duplicate key value violates unique constraint \"ltss_pkey\"", s)
    }
    var n = 0L
    while (r.read() >= 0) n += 1
    n
  }
}
