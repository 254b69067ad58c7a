package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Dedup, LshEncoding}

/** Recall/cost curve for [[Dedup.minhashLshPairs]]' `maxBucketSize`
  * cap on a template-heavy corpus (the boilerplate shape the cap
  * exists for — DedupPathsSpec's fixture deliberately caps 3x UNDER
  * its bucket size to prove subset-ness; this probe measures
  * production-shaped caps instead). For each cap in
  * {none, 10x, 3x, 1x} of the median pairing bucket (buckets of
  * size >= 2 — singletons generate no pairs and would drag the median
  * to 1): emitted pairs, recall vs exact, candidate-join volume
  * (sum of C(sub-bucket, 2), computed exactly from the band-bucket
  * histogram), and the operator's wall time. SCALE.md round-7 records
  * the table. Usage: runMain graft.tools.BucketCapProbe [nDocs]
  */
object BucketCapProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val spark = Engine.session("bucket-cap-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    // 50 docs per template: hot, legitimately-similar buckets
    ScaleProbe.corpus(spark, n, docsPerTemplate = 50)
      .write.mode("overwrite").parquet(s"/tmp/bucketcap/docs_$n")
    val docs = spark.read.parquet(s"/tmp/bucketcap/docs_$n")

    val hist = Dedup.bandBucketSizes(docs, "doc_id", "text", 16, 4).cache()
    val pairing = hist.where(col("size") >= 2)
    val quantiles = pairing.stat.approxQuantile("size", Array(0.5, 0.9, 0.99), 0.0)
    if (quantiles.isEmpty) { // approxQuantile on an empty frame
      println(s"[bucketcap] n=$n: no pairing buckets (every bucket is a singleton) — nothing to cap")
      hist.unpersist(); spark.stop(); return
    }
    val Array(p50, p90, p99) = quantiles
    val maxB = pairing.agg(max(col("size"))).head().getLong(0)
    println(f"[bucketcap] n=$n buckets(size>=2): p50=$p50%.0f p90=$p90%.0f " +
      f"p99=$p99%.0f max=$maxB")

    // candidate volume under a cap m: a size-s bucket splits into
    // (s div m) sub-buckets of m plus one of (s mod m)
    def volume(cap: Option[Int]): Long = cap match {
      case None => hist.agg(sum(expr("size * (size - 1) div 2"))).head().getLong(0)
      case Some(m) => hist.agg(sum(expr(
        s"(size div $m) * (${m.toLong * (m - 1) / 2}) + " +
          s"(size % $m) * (size % $m - 1) div 2"))).head().getLong(0)
    }
    // time through the noop sink (count() prunes the jaccard
    // projection — the CLAUDE.md bench rule), count untimed after.
    // Median of 3 full construct+exec trials per cap: the timed window
    // starts BEFORE construction (the capped path stages its cascade
    // eagerly — real operator cost), and each cap value generates its
    // own codegen, so a single trial per row reads mostly first-run
    // JIT skew (Bench's warmup lesson). Between trials: release
    // scratch and drain dirty pages — without it trial N's writeback
    // bleeds into trial N+1's timed window (round-6 lesson).
    def pairs(cap: Option[Int]): (Long, Double) = {
      var n = -1L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val plan = Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 4, 0.4,
          LshEncoding.MergeWalk, cap)
        graft.Bench.exec(plan)
        val t = (System.nanoTime() - t0) / 1e9
        n = plan.count()
        graft.operators.Scratch.releaseAll()
        try new ProcessBuilder("sync").start().waitFor()
        catch { case scala.util.control.NonFatal(_) => () }
        t
      }
      (n, times.sorted.apply(1))
    }

    val median = p50.toInt
    val (exact, _) = pairs(None) // warm (JIT + page cache) and baseline
    Seq(("none", None), ("10x", Some(10 * median)), ("3x", Some(3 * median)),
      ("1x", Some(median))).foreach { case (label, cap) =>
      val (got, secs) = pairs(cap)
      println(f"[bucketcap] cap=$label%-4s (${cap.getOrElse(-1)}%6d) " +
        f"candidates=${volume(cap)}%10d pairs=$got%8d " +
        f"recall=${if (exact == 0) 1.0 else got.toDouble / exact}%.3f " +
        f"time=$secs%6.2f s")
    }
    hist.unpersist()
    spark.stop()
  }
}
