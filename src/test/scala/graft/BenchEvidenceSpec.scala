package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's contention evidence rests on Measured's
  * spread semantics — pin them. A regression here silently turns the
  * `contended` flag into noise (flagging every clean run via
  * first-iteration JIT) or blindness (never flagging a real stall),
  * which is exactly the round-5 artifact-credibility gap the round-6
  * harness was rebuilt to close. */
class BenchEvidenceSpec extends AnyFunSuite {

  private def m(times: Double*) = Bench.Measured(times, 0.0, failed = false)

  test("median is the upper median of all iterations") {
    assert(m(3.0, 1.0, 2.0).median == 2.0)
    assert(m(4.0, 1.0, 2.0, 3.0).median == 3.0) // upper on even counts
    assert(m(5.0).median == 5.0)
  }

  test("first iteration is excluded from spread evidence (JIT warm-up)") {
    // 5x first iter, flat warm iters: every idle-machine run looks
    // like this on heavy queries — must NOT read as contention
    val warmup = m(10.0, 2.0, 2.1)
    assert(warmup.spreadRatio < 1.1)
    assert(!warmup.material)
  }

  test("a warm-iteration stall IS spread evidence") {
    val stalled = m(2.0, 2.0, 8.0)
    assert(stalled.spreadRatio > 2.0 && stalled.spreadAbs > 1.0)
    assert(stalled.material)
  }

  test("sub-second jitter never reads as material spread") {
    // 2.5x ratio but 0.15s absolute — normal scheduler noise
    assert(!m(0.4, 0.1, 0.25).material)
  }

  test("two-iteration runs fall back to all iterations for spread") {
    assert(m(4.0, 2.0).spreadRatio == 2.0)
  }

  test("post-suite reruns target exactly the materially-spread completed queries") {
    val results = Seq(
      "clean"   -> m(2.0, 2.0, 2.1),        // flat — no rerun
      "stalled" -> m(2.0, 2.0, 8.0),        // material — rerun
      "jitter"  -> m(0.4, 0.1, 0.25),       // sub-second ratio noise — no rerun
      "crashed" -> Bench.Measured(Seq(2.0, 9.0), 0.0, failed = true)) // its -1 is the signal
    assert(Bench.rerunTargets(results, contended = false) == Seq("stalled"))
    // a clean run reruns nothing — the feature costs zero when unneeded
    assert(Bench.rerunTargets(results.filter(_._1 == "clean"), contended = false).isEmpty)
  }

  test("a contended run also reruns the heaviest completed queries") {
    // the round-7 blind spot: steady external load inflates every
    // iteration uniformly (spread ~1.0), so nothing is flagged — only
    // the run-level contended bit knows; the heavy queries must then
    // carry rerun evidence regardless of their spread
    val results = Seq(
      "light1" -> m(0.5, 0.5, 0.5),
      "heavy3" -> m(3.0, 3.0, 3.1),
      "heavy1" -> m(9.0, 9.0, 9.2),
      "heavy2" -> m(5.0, 5.0, 5.1),
      "light2" -> m(1.0, 1.0, 1.0),
      "spiky"  -> m(2.0, 2.0, 8.0),        // material — rerun either way
      "crashed" -> Bench.Measured(Seq(20.0), 0.0, failed = true)) // never rerun
    val got = Bench.rerunTargets(results, contended = true, contendedTopN = 3)
    // spread-flagged first, then heaviest-by-median; no duplicates, no crashed
    assert(got == Seq("spiky", "heavy1", "heavy2", "heavy3"))
    // top-N dedups against an already-flagged heavy query
    val flaggedHeavy = results.map {
      case ("heavy1", _) => "heavy1" -> m(9.0, 9.0, 22.0)
      case other => other
    }
    assert(Bench.rerunTargets(flaggedHeavy, contended = true, contendedTopN = 2) ==
      Seq("heavy1", "spiky", "heavy2"))
    // uncontended: only the spike earns a rerun
    assert(Bench.rerunTargets(results, contended = false) == Seq("spiky"))
  }

  test("failed or empty measurements degrade safely") {
    assert(Bench.Measured(Seq(1.0, 2.0), 0.0, failed = true).median == -1.0)
    assert(Bench.Measured(Nil, 0.0, failed = false).median == -1.0)
    assert(Bench.Measured(Nil, 0.0, failed = false).spreadRatio == 1.0)
    assert(!Bench.Measured(Seq(1.0, 9.0), 0.0, failed = true).material)
  }

  test("contention source attributes container load before host load") {
    // ≥ 0.5 cores of non-bench in-container CPU indicts the container
    // regardless of which flag fired — host loadavg is host-wide on
    // this box, so the cgroup evidence is the more specific witness
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = false,
      Some(2.3)) == "container")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.8)) == "container")
    // high host load with a quiet container: co-tenant containers
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = false,
      Some(0.1)) == "host")
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = true,
      Some(0.0)) == "host")
    // spread spike, quiet container, no load indictment: unnamed culprit
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05)) == "unknown")
    // counters unavailable: degrade to the load flag, never "container"
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = false, None) == "host")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true, None) == "unknown")
    // a quiet run stays quiet even with busy-ish counters: an idle-run
    // co-tenant is context, not an indictment of a run nothing flagged
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = false,
      Some(2.0)) == "none")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = false, None) == "none")
  }

  test("container CPU counters are readable on this box") {
    // the attribution degrades gracefully when absent, but THIS
    // environment has the v1 unified hierarchy — if a driver-image
    // change drops it, this names the loss instead of the artifact
    // silently reverting to load-only evidence
    val cg = Bench.cgroupCpuUsec
    assert(cg.nonEmpty, "no cgroup cpu counter found under /sys/fs/cgroup")
    val own = Bench.processCpuUsec
    assert(own.nonEmpty, "JVM process CPU time unavailable")
    // monotone and plausibly scaled: a second sample must not go back
    val cg2 = Bench.cgroupCpuUsec
    assert(cg2.get >= cg.get)
    assert(own.get > 0L && cg.get > 0L)
  }
}
