package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI wiring for the oracle-tooling negative controls (VERDICT r8 #3):
  * strictcheck.py's exit code must fail on a seeded VALUE mismatch and
  * a seeded dtype violation, and pass on a match — pinned here the way
  * the window-posture guard pins plan regressions. Cancels (not fails)
  * when the driver-side python/duckdb stack isn't on this machine;
  * the driver's own environment always has it.
  */
class ToolsSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb, pandas, numpy")
        .start().waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("strictcheck.py exits nonzero on seeded value/dtype mismatches " +
    "and zero on a match") {
    assume(haveDuckdb, "python3+duckdb not available on this machine")
    val pb = new ProcessBuilder("python3", "tools/strictcheck_selftest.py",
      "/root/testdata/sf0.001")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"selftest failed:\n$out")
    assert(out.contains("SELFTEST OK"), out)
  }
}
