package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-close gate script's host-phase rule (r19 VERDICT task
  * #3): `scripts/selfcheck.py --selftest` replays synthetic bench
  * fixtures — a steady canary, r17's fast-phase 0.596 s, r18's
  * post-probe load shape, a missing canary, and a ceiling breach — and
  * asserts the gate annotates the artifact with `host_phase` and never
  * lets a phase verdict rescue a breach. Runs the script exactly as the
  * round-close checklist does. */
class GateScriptSpec extends AnyFunSuite {
  test("selfcheck --selftest: host_phase annotation + gate ceiling fixtures") {
    import scala.sys.process._
    val repo = new java.io.File(sys.props.getOrElse("user.dir", "."))
    val script = new java.io.File(repo, "scripts/selfcheck.py")
    assume(script.isFile, s"selfcheck.py not found at $script")
    val python = Seq("python3", "--version").!(ProcessLogger(_ => ())) == 0
    assume(python, "python3 unavailable in this environment")
    val out = new StringBuilder
    val code = Process(Seq("python3", script.getPath, "--selftest"), repo)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"gate selftest failed:\n$out")
    assert(out.toString.contains("SELFTEST PASS"), s"unexpected output:\n$out")
  }
}
