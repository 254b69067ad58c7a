package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Engine

/** Scaling probe for the pair-generating operators: synthesizes a
  * template-based corpus (the sparse, open-vocabulary shape of a real
  * crawl — near-dups cluster inside templates instead of globally) at
  * several sizes and times MinHash-LSH end to end, so the growth curve
  * is measured rather than argued. Usage:
  *   runMain graft.tools.ScaleProbe [nDocs ...]   (default 5000 20000 40000)
  */
object ScaleProbe {

  private def tok(i: Int): String = {
    var n = i; val sb = new StringBuilder("w")
    do { sb.append(('a' + n % 26).toChar); n /= 26 } while (n > 0)
    sb.toString
  }

  def corpus(spark: SparkSession, nDocs: Int, tokensPer: Int = 120,
      docsPerTemplate: Int = 5): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val nTemplates = math.max(1, nDocs / docsPerTemplate)
    spark.range(nDocs.toLong).select(col("id"))
      .as[Long]
      .map { id =>
        val tpl = id % nTemplates
        val variant = id / nTemplates
        // template body + a per-doc twist: drop `variant` tokens, add
        // `variant` fresh ones (jaccard ladder inside the template)
        val base = (0 until tokensPer).map(i => tok((tpl * tokensPer + i).toInt))
        val v = variant.toInt
        val body = base.drop(v) ++ (0 until v).map(i => tok(1000000000 + id.toInt * 8 + i))
        (id, body.mkString(" "))
      }.toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(5000, 20000, 40000)
    val spark = Engine.session("scale-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    sizes.foreach { n =>
      val docs = corpus(spark, n)
      docs.write.mode("overwrite").parquet(s"/tmp/scaleprobe/docs_$n")
      val stored = spark.read.parquet(s"/tmp/scaleprobe/docs_$n")
      // warm once (JIT + probe), then measure
      graft.operators.Dedup.minhashLshPairs(stored, "doc_id", "text", 16, 4, 0.4, graft.operators.LshEncoding.Auto).count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(stored, "doc_id", "text", 16, 4, 0.4, graft.operators.LshEncoding.Auto).count()
      val t1 = System.nanoTime()
      val survivors = graft.operators.Dedup.nearDedup(stored, "doc_id", "text",
        threshold = 0.4).count()
      val t2 = System.nanoTime()
      // round-3 operators on the same corpus: batch-vs-corpus
      // incremental pairs (every 7th doc is "new"; 7 stays coprime to the template stride), benchmark
      // decontamination (every 50th doc is the benchmark), repetition
      val newDocs = stored.where(col("doc_id") % 7 === 0)
      val standing = stored.where(col("doc_id") % 7 =!= 0)
      val incr = graft.operators.Dedup.incrementalLshPairs(
        newDocs, standing, "doc_id", "text", 16, 4, 0.4).count()
      val t3 = System.nanoTime()
      val contaminated = graft.operators.TextAnalysis.contaminationStats(
          stored, "doc_id", "text",
          stored.where(col("doc_id") % 50 === 0), "text", 5)
        .where(col("contaminated") === 1).count()
      val t4 = System.nanoTime()
      val repetitive = graft.operators.TextAnalysis.repetitionStats(
          stored, "doc_id", "text", 3)
        .where(col("dup_frac") > 0.1).count()
      val t5 = System.nanoTime()
      // round-3 batch 2. count() would prune the expensive computed
      // columns (the bench lesson), so each probe aggregates over them.
      val segDropped = graft.operators.TextAnalysis.dedupSegments(
          stored, "doc_id", "text", 6)
        .agg(sum(col("n_dropped")), sum(length(col("clean_text"))))
        .collect()(0).getLong(0)
      val t6 = System.nanoTime()
      val oov = graft.operators.TextAnalysis.vocabCoverage(
          stored, "doc_id", "text", 1000)
        .agg(sum(col("n_oov"))).collect()(0).getLong(0)
      val t7 = System.nanoTime()
      val bits = graft.operators.TextAnalysis.unigramSurprisal(
          stored, "doc_id", "text")
        .agg(sum(col("avg_bits"))).collect()(0).getDouble(0)
      val t8 = System.nanoTime()
      // incremental clustering: standing corpus clustered once, then the
      // 1/7 batch folded in — probe measures the FOLD, not the prior CC
      val priorCc = graft.operators.Dedup.connectedComponents(
        graft.operators.Dedup.minhashLshPairs(standing, "doc_id", "text", 16, 4, 0.4))
        .persist()
      priorCc.count()
      val t9 = System.nanoTime()
      val foldPairs = graft.operators.Dedup.incrementalLshPairs(
          newDocs, standing, "doc_id", "text", 16, 4, 0.4)
        .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
        .unionByName(graft.operators.Dedup.minhashLshPairs(
          newDocs, "doc_id", "text", 16, 4, 0.4).select("id_a", "id_b"))
      val merged = graft.operators.Dedup.mergeClusters(priorCc, foldPairs).count()
      val t10 = System.nanoTime()
      priorCc.unpersist()
      println(f"[scale] n=$n%6d pairs=$pairs%9d lsh=${(t1 - t0) / 1e9}%6.2f s " +
        f"survivors=$survivors%6d dedup=${(t2 - t1) / 1e9}%6.2f s " +
        f"incr=$incr%8d ${(t3 - t2) / 1e9}%5.2f s " +
        f"contam=$contaminated%6d ${(t4 - t3) / 1e9}%5.2f s " +
        f"rep=$repetitive%6d ${(t5 - t4) / 1e9}%5.2f s")
      println(f"[scale2] n=$n%6d segdrop=$segDropped%8d ${(t6 - t5) / 1e9}%5.2f s " +
        f"oov=$oov%9d ${(t7 - t6) / 1e9}%5.2f s " +
        f"bits=$bits%12.1f ${(t8 - t7) / 1e9}%5.2f s " +
        f"mergedRows=$merged%7d fold=${(t10 - t9) / 1e9}%5.2f s")
      // round-3 batch 3: retrieval/index/collocation + the top-k
      // aggregate vs the window idiom (same result, different shuffle).
      val queryTerms = Seq(tok(0), tok(1), tok(120), tok(240))
      val bmScore = graft.operators.Retrieval
        .bm25Scores(stored, "doc_id", "text", queryTerms)
        .agg(sum(col("score"))).collect()(0).getDouble(0)
      val t11 = System.nanoTime()
      val postings = stored
        .select(col("doc_id"),
          explode_outer(graft.functions.TextFunctions.tokenSet(col("text"))).as("term"))
        .where(col("term").isNotNull)
        .groupBy("term").agg(count(lit(1)).as("df"))
        .where(col("df") >= 3).count()
      val t12 = System.nanoTime()
      // PMI pair space: per-doc distinct-token self-join (120 toks/doc)
      // restricted to the top-1000 df vocabulary first — the q79 dial.
      // Uncapped, this corpus generates 1.4k pairs/doc (110M rows at
      // 80k docs, ~122 s); the head cut keeps the informative pairs.
      val dtAll = stored.select(col("doc_id"),
          explode_outer(graft.functions.TextFunctions.tokenSet(col("text"))).as("term"))
        .where(col("term").isNotNull)
      val vocab = dtAll.groupBy("term").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(1000).select("term")
      val dt = dtAll.join(broadcast(vocab), Seq("term"), "left_semi")
      val pmiPairs = dt.select(col("doc_id"), col("term").as("ta"))
        .join(dt.select(col("doc_id"), col("term").as("tb")), "doc_id")
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb").agg(count(lit(1)).as("c"))
        .where(col("c") >= 3).count()
      val t13 = System.nanoTime()
      // top-k agg vs window on (n x 200)-row grouped scores
      val scored2 = spark.range(n.toLong * 40).select(
        (col("id") % 1000).as("g"), (col("id") * 2654435761L % 97781L).cast("double").as("s"),
        col("id"))
      val viaAgg = scored2.groupBy("g")
        .agg(graft.functions.TopKAgg.topK(col("s"), col("id"), 5).as("t")).count()
      val t14 = System.nanoTime()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("s").desc, col("id"))
      val viaWin = scored2.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5).groupBy("g").agg(count(lit(1))).count()
      val t15 = System.nanoTime()
      println(f"[scale3] n=$n%6d bm25=${(t11 - t10) / 1e9}%5.2f s (sum=$bmScore%.1f) " +
        f"index=$postings%7d ${(t12 - t11) / 1e9}%5.2f s " +
        f"pmi=$pmiPairs%9d ${(t13 - t12) / 1e9}%5.2f s " +
        f"topkAgg=$viaAgg%5d ${(t14 - t13) / 1e9}%5.2f s vs window ${(t15 - t14) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
