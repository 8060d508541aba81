package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's /proc/stat steal parser: the sampling thread itself
  * cannot be unit-tested (it reads the live host), so the parse — the
  * only logic in it — is pinned here, plus one live read asserting the
  * real /proc/stat parses on this host (the field the r12–r14 bench
  * adjudications hand-measured). */
class StealTraceSpec extends AnyFunSuite {

  test("aggregate cpu line parses to (total, steal); per-cpu and " +
       "non-cpu lines and steal-less kernels are rejected") {
    // user nice system idle iowait irq softirq steal guest guest_nice
    assert(StealTrace.parseCpuLine(
      "cpu  100 2 30 800 5 0 3 60 0 0") === Some((1000L, 60L)))
    // trailing fields optional (steal is the 8th)
    assert(StealTrace.parseCpuLine(
      "cpu  1 2 3 4 5 6 7 8") === Some((36L, 8L)))
    // per-cpu lines must not be sampled (their deltas double-count)
    assert(StealTrace.parseCpuLine("cpu0 100 2 30 800 5 0 3 60")
      === None)
    assert(StealTrace.parseCpuLine("intr 12345") === None)
    // pre-steal kernels (7 fields) are unreadable, not zero-steal
    assert(StealTrace.parseCpuLine("cpu  1 2 3 4 5 6 7") === None)
  }

  test("live /proc/stat parses and is monotone across a sample gap") {
    def read(): Option[(Long, Long)] = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .flatMap(StealTrace.parseCpuLine)
      finally src.close()
    }
    val a = read()
    assert(a.isDefined, "/proc/stat aggregate cpu line must parse here")
    Thread.sleep(120)
    val b = read()
    assert(b.isDefined)
    val (Some((t0, s0)), Some((t1, s1))) = (a, b)
    assert(t1 > t0, "total ticks advance across 120 ms")
    assert(s1 >= s0, "steal ticks are cumulative (monotone)")
  }
}
