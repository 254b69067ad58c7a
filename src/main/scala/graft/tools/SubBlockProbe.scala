package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Skew

/** A/B for the four [[Skew.capBlocks]]/[[Skew.capBlocksHashed]]
  * engagement profiles (rank pay-per-use / rank one-window / hash
  * pay-per-use / hash mostBlocksOver) on a SYNTHETIC GIANT BLOCK — the shape the
  * sort-free hash mode exists for: one block holding most of the
  * input, so the rank window's per-block sort serializes onto a
  * single task no matter how many cores the cluster has.
  *
  * Fixture: `nGiant` rows in ONE block + `nGiant/10` rows spread over
  * 1000 small (under-cap) blocks, staged to parquet (the production
  * calling convention — capBlocks re-scans its input). For each mode:
  * median-of-3 wall time through the noop sink (construct+exec — the
  * pay-per-use modes run their eager phase-1 count inside the timed
  * window, which is real operator cost), plus the max realized
  * sub-block size (rank modes: exactly the cap; hash mode: the
  * multinomial overshoot the scaladoc promises is modest).
  * SCALE.md round-10 records the table.
  * Usage: runMain graft.tools.SubBlockProbe [nGiant] [cap]
  */
object SubBlockProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(10000)
    val spark = Engine.session("subblock-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    spark.range(0, n + n / 10, 1, parts)
      .select(
        when($"id" < n, "giant").otherwise(concat(lit("small"), pmod($"id", lit(1000))))
          .as("block"),
        // stride-8 ids: the arithmetic-progression shape that collapses
        // a plain modulo hash (the scaladoc's gcd failure mode)
        ($"id" * 8).as("rid"))
      .write.mode("overwrite").parquet(s"/tmp/subblock/rows_$n")
    val rows = spark.read.parquet(s"/tmp/subblock/rows_$n")

    def once(mode: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val plan = mode match {
        case "rank-payperuse" => Skew.capBlocks(rows, $"block", $"rid", cap)
        case "rank-onewindow" =>
          Skew.capBlocks(rows, $"block", $"rid", cap, mostBlocksOver = Some(true))
        case "hash" => Skew.capBlocksHashed(rows, $"block", $"rid", cap)
        case "hash-mostover" =>
          Skew.capBlocksHashed(rows, $"block", $"rid", cap, mostBlocksOver = Some(true))
      }
      graft.Bench.exec(plan)
      val t = (System.nanoTime() - t0) / 1e9
      val maxSub = plan.groupBy("__capped_block").count()
        .agg(max("count")).head().getLong(0)
      (t, maxSub)
    }

    once("rank-onewindow") // warm JIT + page cache
    Seq("rank-payperuse", "rank-onewindow", "hash", "hash-mostover").foreach { mode =>
      var maxSub = 0L
      val times = (1 to 3).map { _ =>
        val (t, m) = once(mode); maxSub = m
        try new ProcessBuilder("sync").start().waitFor()
        catch { case scala.util.control.NonFatal(_) => () }
        t
      }
      println(f"[subblock] n=$n cap=$cap mode=$mode%-15s " +
        f"median=${times.sorted.apply(1)}%6.2f s  max_subblock=$maxSub%8d " +
        f"(${100.0 * (maxSub - cap) / cap}%+.1f%% vs cap)")
    }
    spark.stop()
  }
}
