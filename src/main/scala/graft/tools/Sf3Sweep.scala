package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Bench, Engine}
import graft.Engine.table
import graft.operators.{Dedup, LshEncoding, ScaleGuardException}

/** Round-16 sf3 sweep leg for the UNCAPPED dedup/clustering family
  * (r14 verdict item 4, deferred from r15). The registered q18/q49/
  * q53/q62 forms now carry the `candidateBudget` scale guard, which by
  * design FIRES around sf2+ on this 30-word vocabulary — so at sf3 the
  * gate queries fail BY NAME (run them through Bench to capture that
  * artifact) and this probe measures the same operator shapes the way
  * a dial-passing caller would run them: `candidateBudget = None`, the
  * deliberate exact run. Capped/composite forms (q95/q101/q103/q104/
  * q105) need no opt-out — sweep those via Bench SPARK_GRAFT_ONLY.
  *
  * Timing: warm once, then two timed runs (min reported, both
  * printed), session reset between; every timed window bracketed with
  * the CPI spin AND the memory chase so degraded windows are visible
  * in the output (r14's 446.9 s storm-hit q53 iteration shape).
  *
  * Usage: runMain graft.tools.Sf3Sweep <sfDir> [q18u,q49u,...]
  */
object Sf3Sweep {

  private val K = 16
  private val Bands = 4

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/scale/sfg3")
    val only = args.lift(1).map(_.split(",").toSet)
    // validated before the (multi-hundred-second) legs start, same
    // fail-fast contract as Bench's env knobs (round-16 ADVICE)
    val sweepWarm = sys.env.getOrElse("SPARK_GRAFT_SWEEP_WARM", "1") != "0"
    val sweepLegs = sys.env.get("SPARK_GRAFT_SWEEP_LEGS").map { s =>
      require(s.matches("[0-9]+"),
        s"SPARK_GRAFT_SWEEP_LEGS must be a plain non-negative integer, got '$s'")
      s.toInt
    }.getOrElse(2)
    val spark = Engine.session("sf3-sweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def docs = table(spark, sfDir, "documents")

    val probes: Seq[(String, () => DataFrame)] = Seq(
      "q18u" -> (() => Dedup.minhashLshPairs(docs, "doc_id", "text", K, Bands, 0.4,
        LshEncoding.Auto, candidateBudget = None)),
      "q49u" -> (() => Dedup.connectedComponents(
          Dedup.minhashLshPairs(docs, "doc_id", "text", K, Bands, 0.4,
            LshEncoding.Auto, candidateBudget = None))
        .orderBy(col("id"))),
      "q53u" -> (() => Dedup.nearDedup(docs, "doc_id", "text", K, Bands, 0.4,
          candidateBudget = None)
        .select(col("doc_id")).orderBy(col("doc_id"))),
      "q62u" -> (() => {
        val half = docs.where(col("doc_id") % 2 === 0)
        val batch = half.where(col("doc_id") % 10 === 6)
        val corpus = half.where(col("doc_id") % 10 =!= 6)
        val prior = Dedup.connectedComponents(
          Dedup.minhashLshPairs(corpus, "doc_id", "text", K, Bands, 0.4,
            candidateBudget = None))
        val newPairs = Dedup.incrementalLshPairs(batch, corpus, "doc_id", "text",
            K, Bands, 0.4)
          .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
          .unionByName(Dedup.minhashLshPairs(batch, "doc_id", "text", K, Bands, 0.4,
            candidateBudget = None).select("id_a", "id_b"))
        Dedup.mergeClusters(prior, newPairs).orderBy(col("id"))
      }))

    probes.filter(p => only.forall(_.contains(p._1))).foreach { case (name, mk) =>
      def leg(timed: Boolean): Unit = {
        val pre = (Bench.cpuProbeMs(), Bench.memProbeMs())
        val t0 = System.nanoTime()
        try {
          Bench.exec(mk())
          val t = (System.nanoTime() - t0) / 1e9
          val post = (Bench.cpuProbeMs(), Bench.memProbeMs())
          if (timed) println(f"[sf3] $name%-5s ${t}%8.2f s  " +
            f"pre spin/mem ${pre._1.getOrElse(-1.0)}%6.1f/${pre._2.getOrElse(-1.0)}%6.1f ms  " +
            f"post ${post._1.getOrElse(-1.0)}%6.1f/${post._2.getOrElse(-1.0)}%6.1f ms")
        } catch {
          case e: ScaleGuardException =>
            println(s"[sf3] $name GUARD FIRED (unexpected — budget is None): ${e.getMessage}")
          case scala.util.control.NonFatal(e) =>
            println(s"[sf3] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        Bench.resetSession(spark)
      }
      // leg plan: SPARK_GRAFT_SWEEP_WARM=0 skips the warm pass (for the
      // 300-1000 s uncapped sf3 legs, first-run JIT skew is a few
      // percent and a warm pass doubles the sweep's wall);
      // SPARK_GRAFT_SWEEP_LEGS sets the timed count (default 2).
      // Knobs SPARK_GRAFT_-prefixed and validated up front like every
      // other bench env knob (round-16 ADVICE — the bare toInt died
      // with an opaque NumberFormatException)
      if (sweepWarm) leg(timed = false)
      (1 to sweepLegs).foreach(_ => leg(timed = true))
    }
    spark.stop()
  }
}
