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
    // storm-grade steal on SOME query names the hypervisor directly —
    // sharper than the loadavg "host" inference, and the only witness
    // when the 1-minute average hasn't risen (both r13 control-hunt
    // attempts: suite steal ≤0.34, one query at 3.24, old verdict
    // "unknown")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.1), maxQuerySteal = Some(3.24)) == "hypervisor")
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = false,
      Some(0.1), maxQuerySteal = Some(2.5)) == "hypervisor")
    // container evidence still wins (most specific witness)
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = true,
      Some(2.3), maxQuerySteal = Some(9.0)) == "container")
    // sub-bar steal changes nothing: the q18 heap episode (0.48 steal)
    // must stay "unknown", not get blamed on the hypervisor
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxQuerySteal = Some(0.48)) == "unknown")
    // steal on a run nothing flagged is context, not an indictment
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = false,
      Some(0.0), maxQuerySteal = Some(5.0)) == "none")
  }

  test("CPI-degraded windows name cpu_slow, outranked by steal and container evidence") {
    // round 14: the control hunt's episode inflated own-JVM thread-CPU
    // 4-9x at fixed work (q19 at 120s own CPU, then 27.7s at the SAME
    // commit) with steal 0.00-0.03 and a quiet container — every
    // pre-r14 witness read "unknown". A fixed-work probe ratio >= the
    // CPI bar names it.
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxQuerySteal = Some(0.1),
      maxProbeRatio = Some(4.3)) == "cpu_slow")
    // sharper than the loadavg "host" inference, so it outranks it
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = false,
      Some(0.1), maxProbeRatio = Some(2.6)) == "cpu_slow")
    // but the DIRECT witnesses still win: steal names the hypervisor,
    // >= 0.5 co-tenant cores names the container
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxQuerySteal = Some(3.0),
      maxProbeRatio = Some(4.0)) == "hypervisor")
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = true,
      Some(2.3), maxProbeRatio = Some(4.0)) == "container")
    // sub-bar probe ratio changes nothing (percent-level clean variance
    // must not rebrand "unknown")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxProbeRatio = Some(1.3)) == "unknown")
    // a probe reading on a run nothing flagged is context, not a verdict
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = false,
      Some(0.0), maxProbeRatio = Some(9.0)) == "none")
    // absent probe (non-meterable JVM): pre-r14 behavior exactly
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxProbeRatio = None) == "unknown")
  }

  test("the fixed-work CPI probe meters thread CPU and grades degradation") {
    // the probe must return a positive, plausible thread-CPU cost for
    // the fixed spin on any JVM that can meter thread time (Linux can)
    val p = Bench.cpuProbeMs()
    assume(p.nonEmpty, "thread CPU time unmeterable on this JVM — documented degradation")
    assert(p.get > 0.0 && p.get < 60000.0, s"implausible probe reading: $p")
    // grading: ratio >= bar flags, below stays quiet, absent evidence never flags
    assert(Bench.cpuSlowGrade(Some(120.0), Some(30.0), 2.0))
    assert(!Bench.cpuSlowGrade(Some(44.0), Some(30.0), 2.0))
    assert(!Bench.cpuSlowGrade(None, Some(30.0), 2.0))
    assert(!Bench.cpuSlowGrade(Some(120.0), None, 2.0))
    assert(!Bench.cpuSlowGrade(Some(120.0), Some(0.0), 2.0)) // degenerate floor
    // bar env parse fails fast like the storm bar. Default 1.5,
    // calibrated from the round-14 episode night: clean windows read
    // ≤1.09x floor, degraded ones ≥1.55x — and the 2.0 draft bar let a
    // 1.84x background-hum window land a false q77 `regressed`.
    assert(Bench.parseCpiBar(None) == 1.5)
    assert(Bench.parseCpiBar(Some("2.5")) == 2.5)
    intercept[IllegalArgumentException](Bench.parseCpiBar(Some("2,0")))
    intercept[IllegalArgumentException](Bench.parseCpiBar(Some("-1")))
    // the q77 shape under the calibrated default: 75.59 ms rerun probe
    // on a 41.13 ms floor (1.84x) is storm-graded
    assert(Bench.cpuSlowGrade(Some(75.59), Some(41.13), 1.5))
    // clean-tail readings stay quiet (max observed clean ratio 1.09)
    assert(!Bench.cpuSlowGrade(Some(44.9), Some(41.13), 1.5))
    // rerun legs sample IN-BAND (probeDuring): a post-leg-only sample
    // missed an episode that ended inside the 7.2 s attempt-6 q62 leg.
    // The sampler must return a reading for a window long enough to
    // contain at least the initial sample, the body's result rides
    // through untouched, and the post and in-band readings arrive
    // SEPARATELY (they grade against different bars — self-load
    // inflates in-band samples to 1.24-1.26x floor on clean heavy
    // legs, round-15 ADVICE).
    val (out, post, during) = Bench.probeDuring { Thread.sleep(1200); 42 }
    assert(out == 42)
    assume(Bench.cpuProbeMs().nonEmpty, "thread CPU unmeterable — probeDuring degrades to None")
    assert(post.exists(_ > 0.0), s"no post-leg reading: $post")
    assert(during.exists(_ > 0.0), s"no in-band reading: $during")
    // the in-band bar defaults above the quiet bar and validates eagerly
    assert(Bench.parseCpiBarInband(None) == 1.9)
    assert(Bench.parseCpiBarInband(Some("2.5")) == 2.5)
    intercept[IllegalArgumentException](Bench.parseCpiBarInband(Some("2,0")))
  }

  test("a CPI-degraded rerun window cannot confirm a regression") {
    // the r14 false-regressed shape: q19/q24's confirm reruns ran with
    // steal ~0.0 inside a CPI episode and landed `regressed` — with the
    // probe evidence the same rerun grades Stormy (retried, then
    // discarded), exactly like steal-shaped storms
    import Bench.Confirm._
    def o(warm: Option[Double], ctl: Double, probe: Option[Double],
        floor: Option[Double], inband: Option[Double] = None) =
      Bench.confirmOutcome(warm, ctl, Some(0.01), stormBar = 2.0,
        probeMs = probe, probeFloorMs = floor, cpiBar = 2.0,
        probeInbandMs = inband, cpiBarInband = 1.9)
    assert(o(Some(3.7), 0.577, Some(130.0), Some(28.0)) == Stormy)
    // quiet probe, quiet steal, still past the bar: a real regression
    assert(o(Some(3.7), 0.577, Some(29.0), Some(28.0)) == Confirmed)
    // fast rerun exonerates regardless of the probe
    assert(o(Some(0.6), 0.577, Some(300.0), Some(28.0)) == Exonerated)
    // no probe evidence: pre-r14 semantics exactly
    assert(o(Some(3.7), 0.577, None, Some(28.0)) == Confirmed)
    assert(o(Some(3.7), 0.577, Some(130.0), None) == Confirmed)
    // in-band evidence grades against ITS bar (1.9x), not the quiet
    // 1.5/2.0 one: the measured clean in-band tail (1.24-1.26x floor,
    // self-load on a 32-thread leg) must NOT discard a true regression
    // (round-15 ADVICE medium — the silent false negative), while an
    // episode-grade in-band reading still indicts the window
    assert(o(Some(3.7), 0.577, Some(29.0), Some(28.0), Some(35.3)) == Confirmed,
      "clean in-band tail (1.26x) wrongly graded Stormy")
    assert(o(Some(3.7), 0.577, Some(29.0), Some(28.0), Some(46.0)) == Confirmed,
      "1.64x in-band (self-load + hum, under the 1.9 bar) must confirm")
    assert(o(Some(3.7), 0.577, Some(29.0), Some(28.0), Some(70.0)) == Stormy,
      "2.5x in-band episode reading must discard")
  }

  test("the memory chase witnesses the dimension the register spin is blind to") {
    // round-16 verdict item 1: the r15 regime finding — probe-clean
    // readings at 1.25x aggregate vs the r12 control on a
    // byte-identical ~41 ms spin floor — proved the xorshift spin
    // register-only. The chase (dependent loads over a 256 MiB
    // Sattolo cycle, > this box's 105 MiB L3) must meter positive
    // thread-CPU for fixed work, like the spin
    val p = Bench.memProbeMs()
    assume(p.nonEmpty, "thread CPU time unmeterable on this JVM — documented degradation")
    assert(p.get > 0.0 && p.get < 60000.0, s"implausible chase reading: $p")
    // a second call walks a FRESH cycle segment (the cursor advances),
    // so back-to-back quiet readings stay in one band instead of the
    // second reading warm out of L3
    val p2 = Bench.memProbeMs()
    assert(p2.exists(_ > 0.0))
    // bar env parse fails fast like the others; default 1.5 from the
    // tools/MemProbe calibration (quiet tail 1.32x, 16-thread
    // saturation 1.40-3.07x)
    assert(Bench.parseMemBar(None) == 1.5)
    assert(Bench.parseMemBar(Some("1.8")) == 1.8)
    intercept[IllegalArgumentException](Bench.parseMemBar(Some("1,5")))
    intercept[IllegalArgumentException](Bench.parseMemBar(Some("-1")))
  }

  test("memory-degraded windows name mem_slow and discard confirming reruns") {
    // contention_source: a flagged run whose worst chase reading is
    // past the mem bar — with quiet steal, quiet spin, quiet
    // container — names "mem_slow" (the r15 regime shape, previously
    // forced to "unknown")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxQuerySteal = Some(0.1), maxProbeRatio = Some(1.1),
      maxMemProbeRatio = Some(2.1)) == "mem_slow")
    // the sharper instruments still outrank it: cpu_slow (a degraded
    // CPU inflates the chase too), hypervisor, container
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxProbeRatio = Some(2.0),
      maxMemProbeRatio = Some(2.1)) == "cpu_slow")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxQuerySteal = Some(3.0),
      maxMemProbeRatio = Some(2.1)) == "hypervisor")
    assert(Bench.contentionSource(loadHigh = true, spreadFlag = true,
      Some(2.3), maxMemProbeRatio = Some(2.1)) == "container")
    // sub-bar chase readings change nothing (the 1.00-1.32x quiet
    // band must not rebrand "unknown"), nor does a reading on a run
    // nothing flagged
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = true,
      Some(0.05), maxMemProbeRatio = Some(1.3)) == "unknown")
    assert(Bench.contentionSource(loadHigh = false, spreadFlag = false,
      Some(0.0), maxMemProbeRatio = Some(9.0)) == "none")
    // confirmOutcome: a confirming rerun whose post-leg chase reads
    // past the mem bar indicts the window (Stormy — retried then
    // discarded), with every other witness quiet
    import Bench.Confirm._
    def o(memProbe: Option[Double], memFloor: Option[Double]) =
      Bench.confirmOutcome(Some(3.7), 0.577, Some(0.01), stormBar = 2.0,
        probeMs = Some(29.0), probeFloorMs = Some(28.0), cpiBar = 2.0,
        memProbeMs = memProbe, memFloorMs = memFloor, memBar = 1.5)
    assert(o(Some(210.0), Some(100.0)) == Stormy)
    // quiet chase: the regression confirms; absent evidence degrades
    // to the pre-r16 semantics exactly
    assert(o(Some(115.0), Some(100.0)) == Confirmed)
    assert(o(None, Some(100.0)) == Confirmed)
    assert(o(Some(210.0), None) == Confirmed)
  }

  test("container CPU counters are readable where a cgroup hierarchy exists") {
    // the attribution degrades gracefully when absent, and so does
    // this test (round-10 ADVICE: a hard assert coupled suite
    // green-ness to this host's cgroup layout): on a box with NO
    // cgroup cpu file the spec cancels with the reason named, matching
    // the code's documented load-only degradation. Where a hierarchy
    // IS present, a driver-image change that breaks READING it still
    // fails here by name instead of silently reverting the artifact
    // to load-only evidence.
    val candidates = Seq("/sys/fs/cgroup/cpu.stat",
      "/sys/fs/cgroup/unified/cpu.stat", "/sys/fs/cgroup/cpuacct/cpuacct.usage")
    assume(candidates.exists(p => new java.io.File(p).exists),
      s"no cgroup cpu counter file on this box (${candidates.mkString(", ")}) — " +
        "Bench degrades to load-only evidence; nothing to pin here")
    val cg = Bench.cgroupCpuUsec
    assert(cg.nonEmpty, "cgroup cpu file exists but cgroupCpuUsec read none")
    val own = Bench.processCpuUsec
    assert(own.nonEmpty, "JVM process CPU time unavailable")
    // monotone and plausibly scaled: a second sample must not go back
    val cg2 = Bench.cgroupCpuUsec
    assert(cg2.get >= cg.get)
    assert(own.get > 0L && cg.get > 0L)
  }

  test("the stdout line leads with the headline summary and ends with a tail-window summary object") {
    // the consumer keeps only the LAST ~2000 chars of stdout; a
    // 100-query line head-truncates (r9/r10 driver artifacts were both
    // parsed:null). The line must (a) put value/min_total/contended/
    // contention_source before the queries map for front-reading
    // consumers, (b) keep queries ascending so the slowest survive in
    // the tail, and (c) END with a complete brace-balanced summary
    // object so any tail window is machine-readable on its own.
    val line = Bench.renderLine(total = 86.6, minTotal = 79.5,
      contended = false, source = "none", otherBusyCores = Some(0.05),
      commit = Some("abc123def456"), qs = """{"q1":0.5,"q2":9.9}""",
      sf = "0.1", iters = 3, spreads = "{}", rerunJson = "{}",
      loadAvgStart = 1.2, loadAvgEnd = 1.4, maxMemMb = 32768,
      cpus = "32", detailPath = "/tmp/d.json")
    // whole line is one valid JSON object with the contract fields
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}}"))
    for (f <- Seq("\"value\":86.6", "\"min_total\":79.5", "\"contended\":false",
        "\"contention_source\":\"none\"", "\"other_busy_cores\":0.05",
        "\"commit\":\"abc123def456\"", "\"unit\":\"sec\"", "\"sf\":0.1"))
      assert(line.contains(f), s"missing $f in:\n$line")
    // (a) summary precedes the queries map
    assert(line.indexOf("\"min_total\"") < line.indexOf("\"queries\""),
      s"summary fields must lead the line:\n$line")
    assert(line.indexOf("\"contention_source\"") < line.indexOf("\"queries\""))
    // (c) a truncated tail still yields one complete summary object
    val tail = line.takeRight(200) // harsher than the consumer's 2000
    val m = """"summary":(\{[^{}]*\})""".r.findFirstMatchIn(tail)
    assert(m.nonEmpty, s"no extractable summary object in the tail:\n$tail")
    val s = m.get.group(1)
    for (f <- Seq("\"value\":86.6", "\"min_total\":79.5", "\"contended\":false",
        "\"contention_source\":\"none\"", "\"commit\":\"abc123def456\"",
        "\"load_avg_start\":1.2"))
      assert(s.contains(f), s"summary object lacks $f: $s")
    // no-commit / no-counters variants stay valid (fields simply absent)
    val bare = Bench.renderLine(1.0, 1.0, contended = true, source = "host",
      otherBusyCores = None, commit = None, qs = "{}", sf = "0.001", iters = 1,
      spreads = "{}", rerunJson = "{}", loadAvgStart = 9.0, loadAvgEnd = 9.0,
      maxMemMb = 1024, cpus = "8", detailPath = "/tmp/d.json")
    assert(!bare.contains("commit") && !bare.contains("other_busy_cores") &&
      bare.contains("\"summary\":{\"value\":1.0"))
  }

  test("a 110-query line's tail summary survives the driver's 2000-char window") {
    // r16's BENCH line was truncated past recovery in the driver's
    // ~2000-char stdout capture (parsed:null — the round lost its
    // ground-truth perf comparison); r17's parsed, but nothing pinned
    // the LENGTH budget at a full-suite query count. Render a line
    // with MORE queries than the suite ships (110 > 105), realistic
    // name lengths and storm-grade spread/rerun/regressed payloads,
    // and assert the machine-readable summary extracts from EXACTLY
    // the last 2000 chars.
    val qs = (1 to 110).map(i =>
        f""""q${i}%02d_some_longer_query_name_$i":${i * 0.137}%.3f""")
      .mkString("{", ",", "}")
    val spreads = (1 to 8).map(i => s""""q${i}_some_longer_query_name_$i":${i}.${i}""")
      .mkString("{", ",", "}")
    val reruns = (1 to 8).map(i => s""""q${i}_some_longer_query_name_$i":${i}.0${i}""")
      .mkString("{", ",", "}")
    val line = Bench.renderLine(total = 123.456, minTotal = 99.9,
      contended = true, source = "hypervisor", otherBusyCores = Some(2.5),
      commit = Some("0123456789ab"), qs = qs, sf = "0.1", iters = 3,
      spreads = spreads, rerunJson = reruns,
      loadAvgStart = 5.25, loadAvgEnd = 7.5, maxMemMb = 32768,
      cpus = "32", detailPath = "/root/repo/BENCH_DETAIL.json")
    assert(line.length > 2000, s"fixture too small to exercise truncation: ${line.length}")
    val window = line.takeRight(2000) // the driver's exact capture budget
    val m = """"summary":(\{[^{}]*\})""".r.findFirstMatchIn(window)
    assert(m.nonEmpty, s"no extractable summary in the 2000-char tail:\n$window")
    val parsed = org.json4s.jackson.JsonMethods.parse(m.get.group(1))
    import org.json4s._
    assert((parsed \ "value") == JDouble(123.456), m.get.group(1))
    assert((parsed \ "min_total") == JDouble(99.9))
    assert((parsed \ "contention_source") == JString("hypervisor"))
    assert((parsed \ "commit") == JString("0123456789ab"))
  }

  test("unvalidated string fields cannot invalidate the JSON line") {
    // detailPath comes straight from SPARK_GRAFT_DETAIL and cpus from
    // SPARK_GRAFT_CPUS: a quote/backslash path or a non-numeric cpus
    // must degrade to correctly-escaped/quoted JSON, never to a line
    // the driver parses as null — the exact failure the tail-summary
    // redesign exists to prevent (round-11 ADVICE)
    val line = Bench.renderLine(1.0, 1.0, contended = false, source = "none",
      otherBusyCores = None, commit = None, qs = "{}", sf = "0.1", iters = 1,
      spreads = "{}", rerunJson = "{}", loadAvgStart = 0.5, loadAvgEnd = 0.5,
      maxMemMb = 1024, cpus = "thirty\"two", detailPath = "/tmp/we\"ird\\dir/d.json")
    val parsed = org.json4s.jackson.JsonMethods.parse(line) // throws if invalid
    import org.json4s._
    assert((parsed \ "detail") == JString("/tmp/we\"ird\\dir/d.json"),
      s"detail round-trip failed: $line")
    assert((parsed \ "cpus") == JString("thirty\"two"))
    // the normal numeric cpus stays a bare number (consumer compatibility)
    assert(Bench.jnum("32") == "32" && Bench.jnum("0.5") == "0.5")
  }

  test("rerun-confirmed regressions land in both the headline and the tail summary") {
    val line = Bench.renderLine(50.0, 48.0, contended = false, source = "none",
      otherBusyCores = None, commit = Some("abc123"), qs = """{"q1":20.0}""",
      sf = "0.1", iters = 3, spreads = "{}", rerunJson = """{"q1":19.5}""",
      loadAvgStart = 0.5, loadAvgEnd = 0.5, maxMemMb = 1024, cpus = "32",
      detailPath = "/tmp/d.json", regressed = Seq("q1"))
    org.json4s.jackson.JsonMethods.parse(line)
    // headline (front window) AND the tail summary duplicate both
    // carry it — a regression must survive either truncation direction
    assert(line.indexOf("\"regressed\":[\"q1\"]") >= 0 &&
      line.indexOf("\"regressed\":[\"q1\"]") < line.indexOf("\"queries\""),
      s"regressed must lead the line:\n$line")
    val tail = """"summary":(\{[^{}\[\]]*(\[[^\]]*\])?[^{}]*\})""".r
      .findFirstMatchIn(line.takeRight(250))
    assert(tail.exists(_.group(1).contains("\"regressed\":[\"q1\"]")),
      s"tail summary lacks regressed: ${line.takeRight(250)}")
    // a clean run emits NO regressed field at all
    val clean = Bench.renderLine(50.0, 48.0, contended = false, source = "none",
      otherBusyCores = None, commit = None, qs = "{}", sf = "0.1", iters = 3,
      spreads = "{}", rerunJson = "{}", loadAvgStart = 0.5, loadAvgEnd = 0.5,
      maxMemMb = 1024, cpus = "32", detailPath = "/tmp/d.json")
    assert(!clean.contains("regressed"))
  }

  test("suite-spanning regime grades a Confirmed candidate unverifiable, not regressed (r16 item 5)") {
    import Bench.unverifiableRegime
    // q97's exact r16 shape: suite attributed to the hypervisor
    // episode, the candidate's own in-suite windows at probe 5-6x
    // floor — yet its confirm rerun read probe-clean/sub-storm-steal
    // and Confirmed 7.77 s into the driver artifact. Both conditions
    // must hold:
    // (suite regime + degraded own windows) -> unverifiable
    assert(unverifiableRegime("hypervisor", Some(220.0), Some(41.0),
      Some(563.0), Some(100.0), regimeBar = 5.0))
    // either probe dimension past the bar suffices (mem-only here)
    assert(unverifiableRegime("mem_slow", Some(44.0), Some(41.0),
      Some(563.0), Some(100.0), regimeBar = 5.0))
    assert(unverifiableRegime("cpu_slow", Some(220.0), Some(41.0),
      None, None, regimeBar = 5.0))
    // suite regime alone must NOT mute the tripwire: a candidate whose
    // own windows were probe-clean stays regressed even on a flagged run
    assert(!unverifiableRegime("hypervisor", Some(44.0), Some(41.0),
      Some(110.0), Some(100.0), regimeBar = 5.0))
    // degraded windows without a suite-level regime attribution stay
    // regressed too (per-window grading already owns that case)
    for (s <- Seq("none", "unknown", "host", "container"))
      assert(!unverifiableRegime(s, Some(220.0), Some(41.0),
        Some(563.0), Some(100.0), regimeBar = 5.0), s)
    // absent evidence degrades to regressed (evidence, not a gate)
    assert(!unverifiableRegime("hypervisor", None, Some(41.0),
      None, Some(100.0), regimeBar = 5.0))
    // bar parse: fail-fast like the other bars, default 5.0
    assert(Bench.parseRegimeBar(None) == 5.0)
    assert(Bench.parseRegimeBar(Some("6.5")) == 6.5)
    intercept[IllegalArgumentException](Bench.parseRegimeBar(Some("5,0")))
    // the bucket ships in the line's headline AND tail summary,
    // separate from `regressed`
    val line = Bench.renderLine(50.0, 48.0, contended = true,
      source = "hypervisor", otherBusyCores = None, commit = Some("abc123"),
      qs = """{"q97":7.7}""", sf = "0.1", iters = 3, spreads = "{}",
      rerunJson = "{}", loadAvgStart = 0.5, loadAvgEnd = 0.5,
      maxMemMb = 1024, cpus = "32", detailPath = "/tmp/d.json",
      regressed = Nil, regressedUnverifiable = Seq("q97"))
    org.json4s.jackson.JsonMethods.parse(line)
    assert(line.contains("\"regressed_unverifiable_regime\":[\"q97\"]"))
    assert(!line.contains("\"regressed\":["),
      "an unverifiable candidate must not also land in regressed")
    val tail = """"summary":(\{.*\})""".r.findFirstMatchIn(line.takeRight(300))
    assert(tail.exists(_.group(1).contains("regressed_unverifiable_regime")),
      s"tail summary lacks the bucket: ${line.takeRight(300)}")
  }

  test("scrub window grading: missing sample is dirty, unmetered floor passes vacuously (r16 ADVICE)") {
    import Bench.scrubWindowClean
    // metered floor: the normal ratio grading
    assert(scrubWindowClean(Some(44.0), Some(41.0), bar = 1.1))
    assert(!scrubWindowClean(Some(60.0), Some(41.0), bar = 1.1))
    // metered floor + missing sample: ungraded window -> dirty
    assert(!scrubWindowClean(None, Some(41.0), bar = 1.1))
    // unmetered floor (JVM without the probe's metering): grading every
    // window dirty would doom all scrub attempts — vacuous pass, with
    // the degradation recorded as scrub_unmetered in the detail file
    assert(scrubWindowClean(Some(60.0), None, bar = 1.1))
    assert(scrubWindowClean(None, None, bar = 1.1))
    assert(scrubWindowClean(None, Some(0.0), bar = 1.1))
  }

  test("the committed-control tripwire: filename, parsing, and confirm semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctl").toFile
    try {
      def write(name: String, body: String): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          body.getBytes("UTF-8"))
      // detail-file format, the exact bytes a control run writes
      write("BENCH_CONTROL_r11.json",
        """{"sf":0.1,"cpus":32,"iters":3,"driver_max_mem_mb":32768,
          |"commit":"abc","queries":{
          |"q_fast":{"median":0.4},"q_heavy":{"median":4.0}}}""".stripMargin)
      write("BENCH_CONTROL_r9.json",
        """{"sf":0.1,"cpus":32,"queries":{"q_heavy":{"median":99.0}}}""")
      write("BENCH_DETAIL.json", // driver-owned, must NEVER be read as a control
        """{"sf":0.1,"cpus":32,"queries":{"q_heavy":{"median":0.001}}}""")
      val cs = Bench.controls(dir.getPath)
      assert(cs.nonEmpty, "no control parsed")
      // newest round first (so the caller's find() prefers it, but an
      // incomparable newer control FALLS BACK to an older matching one
      // instead of disabling the tripwire); sf/cpus keep their rendered
      // forms; the driver detail file is invisible to the lookup
      assert(cs.map(c => c.path.takeRight(21)) ==
        Seq("BENCH_CONTROL_r11.json", "BENCH_CONTROL_r9.json").map(_.takeRight(21)))
      val c = cs.headOption
      assert(c.get.path.endsWith("BENCH_CONTROL_r11.json"))
      assert(c.get.sf == "0.1" && c.get.cpus == "32" && c.get.commit.contains("abc"))
      // heap is part of comparability: an 8g-vs-32g JVM delta reads as
      // a uniform slowdown and would flag every heavy query (a control
      // without the field — pre-round-12 format — compares as before)
      assert(c.get.maxMemMb.contains(32768L))
      assert(Bench.parseControl(new java.io.File(dir, "BENCH_CONTROL_r9.json"))
        .get.maxMemMb.isEmpty)
      assert(c.get.medians == Map("q_fast" -> 0.4, "q_heavy" -> 4.0))
      // candidate selection: >2x AND >1s absolute, failed queries exempt
      def meas(t: Double) = Bench.Measured(Seq(t, t, t), 0.0, failed = false)
      val results = Map(
        "q_heavy" -> meas(9.0),   // 2.25x and +5s  -> candidate
        "q_fast"  -> meas(0.9),   // 2.25x but +0.5s -> sub-second jitter, no
        "q_new"   -> meas(50.0),  // no control median -> no
        "q_dead"  -> Bench.Measured(Seq(9.0), 0.0, failed = true)) // -1 median
      assert(Bench.regressionCandidates(results, c.get.medians).keySet == Set("q_heavy"))
      // confirmation applies the same bar to the warm rerun time
      assert(Bench.regressedVs(9.0, 4.0))    // 2.25x, +5s: confirmed
      assert(!Bench.regressedVs(4.3, 4.0))   // +0.3s: not even 2x
      assert(!Bench.regressedVs(1.9, 0.9))   // 2.1x but +1.0s: below the floor
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("control lineage: HEAD's own commit is an ancestor, garbage is indeterminate") {
    assume(new java.io.File(System.getProperty("user.dir"), ".git").exists,
      "no .git — ancestry is documented-indeterminate outside a repo")
    val head = Bench.gitHead
    assume(head.nonEmpty, "gitHead unavailable")
    // a control stamped at (or dirty-on-top-of) the current HEAD is
    // same-lineage; the -dirty suffix is stripped before the check
    assert(Bench.isAncestorOfHead(head.get).contains(true),
      s"HEAD ${head.get} not its own ancestor?")
    // unknown hash: indeterminate (None), which the tripwire treats as
    // comparable — best-effort evidence, not a gate
    assert(Bench.isAncestorOfHead("0000000000000000000000000000000000000000").isEmpty)
  }

  test("gitHead stamps a plausible commit in this repo") {
    // portability: on a checkout without .git (a source tarball) the
    // stamp is documented-absent, so the pin cancels rather than
    // coupling suite green-ness to the layout (same rule as the
    // cgroup-counter test above)
    assume(new java.io.File(System.getProperty("user.dir"), ".git").exists,
      "no .git in the working directory — gitHead is documented to omit the stamp")
    val h = Bench.gitHead
    assert(h.nonEmpty && h.get.matches("[0-9a-f]{6,40}(-dirty)?"),
      s"gitHead returned $h in a git repo — artifacts would lose attribution")
    // this test runs from a session with uncommitted edits often
    // enough that asserting either clean or dirty would flake; the
    // -dirty MECHANISM is what matters — porcelain status (tracked
    // files, minus the driver-artifact exclusions gitHead applies)
    // and the suffix must agree
    val status = new ProcessBuilder("git", "status", "--porcelain", "-uno")
      .directory(new java.io.File(System.getProperty("user.dir"))).start()
    val lines = new String(status.getInputStream.readAllBytes, "UTF-8")
      .split("\n").toSeq
    status.waitFor()
    val dirty = Bench.dirtyPaths(lines).nonEmpty
    assert(h.get.endsWith("-dirty") == dirty,
      s"gitHead says ${h.get} but porcelain dirty=$dirty — pre-commit probe " +
        "artifacts would be attributed to the wrong source")
  }

  test("driver-rewritten artifacts never dirty the commit stamp") {
    // the round-12 control-run footgun: a bench run rewrites
    // BENCH_DETAIL.json, so the NEXT control run stamped `-dirty` from
    // the PREVIOUS run's artifact unless the operator remembered a
    // manual `git checkout` first. Artifact-only edits are clean;
    // any source edit still dirties.
    def d(lines: String*) = Bench.dirtyPaths(lines)
    assert(d(" M BENCH_DETAIL.json").isEmpty)
    assert(d(" M BENCH_r12.json", " M CORRECTNESS_r12.json",
      " M BENCH_CONTROL_r12.json", " M LEAKCHECK.json", " M COPYCHECK.json",
      " M VERDICT.md", " M ADVICE.md", " M PROGRESS.jsonl").isEmpty)
    // a real file edit dirties, alone or alongside artifacts
    assert(d(" M src/main/scala/graft/Bench.scala") ==
      Seq("src/main/scala/graft/Bench.scala"))
    assert(d(" M BENCH_DETAIL.json", " M build.sbt") == Seq("build.sbt"))
    // near-miss names are NOT artifacts (closed list, wrongly-clean is
    // the dangerous direction): a nested copy, a prefix, a tweak
    assert(d(" M docs/BENCH_DETAIL.json").nonEmpty)
    assert(d(" M BENCH_DETAIL.json.bak").nonEmpty)
    assert(d(" M BENCH_rXX.json").nonEmpty)
    // renames: clean only when BOTH sides are artifacts
    assert(d("R  BENCH_r11.json -> BENCH_r12.json").isEmpty)
    assert(d("R  BENCH_r11.json -> src/kept.json").nonEmpty)
    assert(d("R  build.sbt -> BENCH_DETAIL.json").nonEmpty)
    // the ' -> ' split applies ONLY to rename/copy status codes: a
    // MODIFIED file literally named with ' -> ' and artifact names on
    // both sides must count dirty (round-13 ADVICE — v1 porcelain
    // doesn't quote spaces, wrongly-clean is the dangerous direction)
    assert(d(" M BENCH_r11.json -> BENCH_r12.json").nonEmpty)
    assert(d("C  BENCH_r11.json -> BENCH_r12.json").isEmpty)
    // blank separator lines are ignored
    assert(d("", " M ADVICE.md").isEmpty)
  }

  test("storm bar env parse fails fast on malformed values") {
    // round-13 ADVICE: the bar is consumed only post-suite; a bare
    // .toDouble on '2,0' would throw AFTER the suite spent an hour and
    // lose the run's artifacts. parseStormBar runs at main() start.
    assert(Bench.parseStormBar(None) == 2.0)
    assert(Bench.parseStormBar(Some("0.01")) == 0.01)
    assert(Bench.parseStormBar(Some("3")) == 3.0)
    intercept[IllegalArgumentException](Bench.parseStormBar(Some("2,0")))
    intercept[IllegalArgumentException](Bench.parseStormBar(Some("")))
    intercept[IllegalArgumentException](Bench.parseStormBar(Some("-1")))
  }

  test("storm-grade rerun windows cannot confirm a regression") {
    // round-12 verdict item 1: q50's confirm rerun read 21.4s under a
    // load storm vs its 4.5s control — a storm-hit rerun of a true
    // candidate would land a FALSE `regressed` in the driver artifact.
    // The storm witness is hypervisor steal over the rerun window
    // (loadavg is self-contaminated: the clean r12 control's
    // rerun_load spans 5.8-11.5), bar 2.0 stolen cores vs the
    // quiet-window calibration of 0.35 idle / 0.67 under full demand.
    import Bench.Confirm._
    def o(warm: Option[Double], ctl: Double, steal: Option[Double]) =
      Bench.confirmOutcome(warm, ctl, steal, stormBar = 2.0)
    // quiet window, still past the bar: a real regression
    assert(o(Some(21.4), 4.5, Some(0.4)) == Confirmed)
    // same rerun under storm-grade steal: indicts the storm, discarded
    assert(o(Some(21.4), 4.5, Some(6.0)) == Stormy)
    // a fast rerun exonerates on ANY window — external load only ever
    // slows a run, so mid-storm exoneration is valid evidence
    assert(o(Some(4.6), 4.5, Some(9.0)) == Exonerated)
    assert(o(Some(4.6), 4.5, Some(0.1)) == Exonerated)
    // a crashed rerun confirms nothing (round-7 ADVICE shape)
    assert(o(None, 4.5, Some(0.0)) == Unresolved)
    // steal unavailable (non-Linux): degrade to pre-round-13 confirm
    assert(o(Some(21.4), 4.5, None) == Confirmed)
    assert(Bench.stormGrade(Some(2.0), 2.0) && !Bench.stormGrade(Some(1.9), 2.0))
    assert(!Bench.stormGrade(None, 2.0))
    // the witness itself is readable on this box (degrades by name off-Linux)
    assume(new java.io.File("/proc/stat").exists, "no /proc/stat — documented degradation")
    val s = Bench.procStatStealUsec
    assert(s.nonEmpty && s.get >= 0L)
    assert(Bench.procStatStealUsec.get >= s.get) // monotone
    // iowait rides the same reader as evidence-only (NEVER storm
    // grading — own spill IO would wrongly discard a true confirm)
    val io = Bench.procStatIowaitUsec
    assert(io.nonEmpty && io.get >= 0L)
  }

  test("a storm-hit control's inflated medians yield tightened baselines") {
    // round-12 ADVICE: the committed r12 control carries four
    // spread-flagged queries whose medians are 1.5-2.6x their own
    // exonerating reruns; a median-only read dulls the tripwire on
    // exactly those queries
    import Bench.controlBaseline
    // unflagged: the median stands
    assert(controlBaseline(4.0, None, Some(3.8), Some(1.05)) == 4.0)
    // flagged with a rerun: the rerun is the clean evidence (q34 shape)
    assert(controlBaseline(1.039, Some(0.667), Some(0.892), Some(2.4)) == 0.667)
    // a rerun that landed in a SECOND storm may only tighten, never loosen
    assert(controlBaseline(1.0, Some(5.0), Some(0.9), Some(2.0)) == 1.0)
    // spread-flagged but rerun-less (crashed rerun): fastest iteration
    assert(controlBaseline(4.73, None, Some(4.713), Some(2.35)) == 4.713)
    // pre-round-13 control format (median only) parses as before
    assert(controlBaseline(4.0, None, None, None) == 4.0)
    // end-to-end through parseControl: the r12-control shape
    val dir = java.nio.file.Files.createTempDirectory("graft_ctlb").toFile
    try {
      val f = new java.io.File(dir, "BENCH_CONTROL_r12.json")
      java.nio.file.Files.write(f.toPath,
        """{"sf":0.1,"cpus":32,"queries":{
          |"q_flagged":{"iters":[4.7,1.04,2.4],"min":0.892,"median":1.039,
          |"spread":2.4,"failed":false,"rerun":0.667,"rerun_load":5.79},
          |"q_clean":{"iters":[2.0,2.0,2.0],"min":2.0,"median":2.0,
          |"spread":1.0,"failed":false}}}""".stripMargin.getBytes("UTF-8"))
      val c = Bench.parseControl(f)
      assert(c.exists(_.medians == Map("q_flagged" -> 0.667, "q_clean" -> 2.0)))
    } finally { dir.listFiles.foreach(_.delete()); dir.delete() }
  }

  test("a bracketed clean reading overturns a storm-inflated Confirmed verdict") {
    // the r15 capture shape: q18's confirm rerun read 2x+ the r14
    // baseline with probe-clean post samples (the episode cleared
    // before every quiet sample), landing a false `regressed` — the
    // scrub's verified-clean 3.06 s against the 2.015 s baseline is
    // under the 2x+1s bar and must exonerate
    import Bench.Confirm._
    import Bench.adjudicateWithClean
    assert(adjudicateWithClean(Confirmed, Some(3.06), 2.015) == Exonerated)
    // a clean reading that STILL regresses confirms (real regression)
    assert(adjudicateWithClean(Confirmed, Some(5.5), 2.015) == Confirmed)
    // no clean evidence: verdict stands; non-Confirmed never adjudicated
    assert(adjudicateWithClean(Confirmed, None, 2.015) == Confirmed)
    assert(adjudicateWithClean(Stormy, Some(0.5), 2.015) == Stormy)
    assert(adjudicateWithClean(Exonerated, Some(9.9), 2.015) == Exonerated)
  }

  test("a scrubbed clean-window reading outranks every inferred baseline form") {
    // round-15 control capture: per-query "clean" (a warm execution on
    // a verified probe-clean window) is the baseline — no exoneration
    // arithmetic needed at compare time — min()'d with the median for
    // the same only-ever-tighten reason reruns get
    val dir = java.nio.file.Files.createTempDirectory("graft_ctlc").toFile
    try {
      val f = new java.io.File(dir, "BENCH_CONTROL_r15.json")
      java.nio.file.Files.write(f.toPath,
        """{"sf":0.1,"cpus":32,"queries":{
          |"q_scrubbed":{"iters":[9.7,8.04,8.4],"min":8.04,"median":8.4,
          |"spread":1.05,"failed":false,"rerun":7.9,"probe_clean":true,
          |"clean":3.2,"clean_probe_ms":42.1,"scrub_attempts":2},
          |"q_clean_insuite":{"iters":[2.0,2.0,2.0],"min":2.0,"median":2.0,
          |"spread":1.0,"failed":false,"probe_clean":true},
          |"q_clean_loosens":{"iters":[1.0,1.0,1.0],"min":1.0,"median":1.0,
          |"spread":1.0,"failed":false,"clean":5.0},
          |"q_rerun_tightens":{"iters":[8.0,8.0,8.0],"min":8.0,"median":8.0,
          |"spread":1.0,"failed":false,"rerun":2.0,"clean":3.0}}}""".stripMargin.getBytes("UTF-8"))
      val c = Bench.parseControl(f)
      // clean beats median AND rerun; a clean slower than the median
      // (the scrub window was still degraded in a way the probe
      // missed) may only tighten, never loosen — and an exonerating
      // rerun FASTER than the clean reading keeps tightening too:
      // clean folds into the same min as the inferred baseline, it
      // never bypasses it (round-15 ADVICE: rerun < clean < median
      // must resolve to the rerun, not the clean)
      assert(c.exists(_.medians == Map(
        "q_scrubbed" -> 3.2, "q_clean_insuite" -> 2.0, "q_clean_loosens" -> 1.0,
        "q_rerun_tightens" -> 2.0)))
    } finally { dir.listFiles.foreach(_.delete()); dir.delete() }
  }

  test("control comparability canonicalizes both sides through one renderer") {
    // round-12 ADVICE: jstr escapes a control char as backslash-u000a
    // while jackson renders backslash-n — exact-form equality between a jstr fallback
    // (sfDir without "sfN", non-numeric cpus) and the control file's
    // jackson-rendered field silently disabled the tripwire
    val weird = "dir\nwith\tctrl"
    val jackson = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JString(weird)))
    assert(Bench.jstr(weird) != jackson, "escaping divergence gone — keep the pin anyway")
    assert(Bench.canonJson(Bench.jstr(weird)) == Bench.canonJson(jackson))
    // bare numbers and plain strings are fixed points
    assert(Bench.canonJson("0.1") == "0.1" && Bench.canonJson("32") == "32")
    assert(Bench.canonJson("\"sf0.1x\"") == "\"sf0.1x\"")
    // unparseable input returns itself (comparability degrades, never throws)
    assert(Bench.canonJson("not json at all") == "not json at all")
  }
}
