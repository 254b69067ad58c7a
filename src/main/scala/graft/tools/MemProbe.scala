package graft.tools

/** Calibration harness for [[graft.Bench.memProbeMs]] (round-16
  * verdict item 1): prints chase readings on a quiet window, then
  * under an in-JVM bandwidth hog (K threads streaming writes over
  * private 64 MiB arrays — the reproducible proxy for the co-tenant
  * memory pressure the register-only CPI probe is blind to), then
  * quiet again. The quiet spread calibrates the clean band; the
  * hogged band calibrates the degraded bar. The CPI spin is sampled
  * alongside to demonstrate the blindness this probe exists to close:
  * the spin should stay ~flat under the hog while the chase inflates.
  *
  * Round-17 (r16 verdict item 6): a sequential-read BANDWIDTH sample
  * (GB/s over a fixed 256 MiB buffer, one ~20 ms pass) runs alongside
  * the latency chase, and a second hog class — dependent-load pointer
  * chasers, the latency-heavy/bandwidth-light co-tenant shape — joins
  * the calibration. The question the pair answers: does
  * (chase ratio, bandwidth ratio) SEPARATE co-tenant classes the
  * chase alone can't? Each phase prints both dimensions; the summary
  * bands them per phase. Findings land in SCALE.md round 17.
  *
  * Usage: runMain graft.tools.MemProbe [quietN] [hogThreads] [hogN]
  */
object MemProbe {

  /** Sequential-read bandwidth over a fixed 256 MiB long buffer, GB/s.
    * One pass ≈ 15-25 ms clean — same cost class as the chase, cheap
    * enough to sample in every hygiene window if it earns a place in
    * Bench. Reads (not writes): a read stream measures the consumable
    * bandwidth a query's scan-side actually competes for, and doesn't
    * dirty 256 MiB of lines the next phase must write back. */
  private lazy val bwArr: Array[Long] = {
    val a = new Array[Long](32 << 20) // 256 MiB, > the 105 MiB L3
    java.util.Arrays.fill(a, 3L)
    a
  }
  private def bandwidthGBs(): Double = {
    var s = 0L
    val t0 = System.nanoTime()
    var i = 0
    while (i < bwArr.length) { s += bwArr(i); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (s == Long.MinValue) System.err.print("") // keep the sum live
    bwArr.length.toLong * 8 / dt / 1e9
  }

  def main(args: Array[String]): Unit = {
    val quietN = args.lift(0).map(_.toInt).getOrElse(20)
    val hogThreads = args.lift(1).map(_.toInt).getOrElse(16)
    val hogN = args.lift(2).map(_.toInt).getOrElse(20)

    def sample(tag: String, n: Int): (Seq[Double], Seq[Double]) = {
      val readings = (1 to n).map { i =>
        val mem = graft.Bench.memProbeMs()
        val bw = bandwidthGBs()
        val cpu = graft.Bench.cpuProbeMs()
        println(f"$tag%-6s $i%3d  mem ${mem.getOrElse(-1.0)}%8.2f ms   " +
          f"bw $bw%6.2f GB/s   spin ${cpu.getOrElse(-1.0)}%8.2f ms")
        (mem, bw)
      }
      (readings.flatMap(_._1), readings.map(_._2))
    }

    def hogPhase(tag: String, mk: () => Runnable): (Seq[Double], Seq[Double]) = {
      println(s"== $tag ($hogThreads threads) ==")
      @volatile var stop = false
      val hogs = (1 to hogThreads).map { _ =>
        val r = mk()
        val t = new Thread(() => { while (!stop) r.run() }, s"hog-$tag")
        t.setDaemon(true); t.start(); t
      }
      Thread.sleep(500) // let the hogs saturate
      val hot = sample(tag.take(6), hogN)
      stop = true
      hogs.foreach(_.join(2000))
      hot
    }

    println("== quiet (pre) ==")
    val pre = sample("quiet", quietN)

    // hog class A: streaming WRITES — the bandwidth-saturating
    // co-tenant (ETL scans, memcpy-heavy neighbors)
    val bwHog = hogPhase("bw-hog", () => new Runnable {
      val a = new Array[Long](8 << 20) // 64 MiB per thread, > L2
      var v = 1L
      def run(): Unit = {
        var i = 0
        while (i < a.length) { a(i) = v; i += 7 } // stride-7: defeat combining
        v += 1
        if (a(0) == -1) System.err.print("")
      }
    })

    println("== quiet (mid) ==")
    val mid = sample("quiet", quietN)

    // hog class B: dependent-load pointer chasers — the latency-heavy
    // bandwidth-light co-tenant (graph/hash-probe neighbors): each
    // loaded line is a full memory latency but only ~64 B of traffic
    val latHog = hogPhase("lat-hog", () => new Runnable {
      // private 32 MiB Sattolo single-cycle (a multiplicative map mod
      // 2^23 has a fixed point at 0 — a chaser started there would
      // spin L1-resident and hog nothing)
      val a: Array[Int] = {
        val n = 8 << 20
        val arr = Array.tabulate(n)(identity)
        var seed = System.nanoTime() | 1L
        var i = n - 1
        while (i > 0) {
          seed = seed * 6364136223846793005L + 1442695040888963407L
          val j = ((seed >>> 33) % i).toInt
          val t = arr(i); arr(i) = arr(j); arr(j) = t
          i -= 1
        }
        arr
      }
      var cur = 0
      def run(): Unit = {
        var i = 0
        while (i < (1 << 18)) { cur = a(cur); i += 1 }
        if (cur == -1) System.err.print("")
      }
    })

    println("== quiet (post) ==")
    val post = sample("quiet2", quietN)

    val quietMem = pre._1 ++ mid._1 ++ post._1
    val quietBw = pre._2 ++ mid._2 ++ post._2
    val floor = quietMem.min
    val bwCeil = quietBw.max
    def band(tag: String, mem: Seq[Double], bw: Seq[Double]): Unit = {
      if (mem.nonEmpty)
        println(f"$tag%-8s n=${mem.size}%3d  mem ${mem.min}%7.2f..${mem.max}%7.2f ms  " +
          f"ratio ${mem.min / floor}%5.2f..${mem.max / floor}%5.2f   " +
          f"bw ${bw.min}%5.2f..${bw.max}%5.2f GB/s  " +
          f"frac-of-quiet-best ${bw.min / bwCeil}%4.2f..${bw.max / bwCeil}%4.2f")
    }
    println(f"chase floor $floor%7.2f ms   quiet-best bw $bwCeil%6.2f GB/s")
    band("quiet", quietMem, quietBw)
    band("bw-hog", bwHog._1, bwHog._2)
    band("lat-hog", latHog._1, latHog._2)
  }
}
