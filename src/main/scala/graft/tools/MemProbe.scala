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
  * Usage: runMain graft.tools.MemProbe [quietN] [hogThreads] [hogN]
  */
object MemProbe {

  def main(args: Array[String]): Unit = {
    val quietN = args.lift(0).map(_.toInt).getOrElse(20)
    val hogThreads = args.lift(1).map(_.toInt).getOrElse(16)
    val hogN = args.lift(2).map(_.toInt).getOrElse(20)

    def sample(tag: String, n: Int): Seq[Double] = {
      val readings = (1 to n).flatMap { i =>
        val mem = graft.Bench.memProbeMs()
        val cpu = graft.Bench.cpuProbeMs()
        println(f"$tag%-6s $i%3d  mem ${mem.getOrElse(-1.0)}%8.2f ms   spin ${cpu.getOrElse(-1.0)}%8.2f ms")
        mem
      }
      readings
    }

    println("== quiet (pre) ==")
    val pre = sample("quiet", quietN)

    println(s"== hogged ($hogThreads streaming-write threads) ==")
    @volatile var stop = false
    val hogs = (1 to hogThreads).map { _ =>
      val t = new Thread(() => {
        val a = new Array[Long](8 << 20) // 64 MiB per thread, > L2
        var v = 1L
        while (!stop) {
          var i = 0
          while (i < a.length) { a(i) = v; i += 7 } // stride-7: defeat simple combining
          v += 1
        }
        if (a(0) == -1) System.err.print("")
      }, "mem-hog")
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(500) // let the hogs saturate
    val hot = sample("hog", hogN)
    stop = true
    hogs.foreach(_.join(2000))

    println("== quiet (post) ==")
    val post = sample("quiet2", quietN)

    val floor = (pre ++ post).min
    def band(tag: String, xs: Seq[Double]): Unit = if (xs.nonEmpty)
      println(f"$tag%-8s n=${xs.size}%3d  min ${xs.min}%7.2f  max ${xs.max}%7.2f  " +
        f"ratio-vs-floor ${xs.min / floor}%5.2f..${xs.max / floor}%5.2f")
    println(f"floor $floor%7.2f ms")
    band("quiet", pre ++ post)
    band("hogged", hot)
  }
}
