package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design (100 TB): every operator is blocking-based — no global
  * O(n^2). Exact dedup is one hash shuffle on the digest. MinHash-LSH
  * shuffles once on (band index, band key) so only same-bucket rows
  * meet; candidate verification re-joins token sets on the candidate
  * pair ids (two broadcast-able or shuffle equi-joins). SimHash is an
  * explode + map-side-combined sum per (doc, bit). Skewed buckets
  * (e.g. boilerplate-heavy corpora) split under AQE skew-join handling;
  * pathological buckets can additionally be capped upstream by salting
  * the band key with a within-bucket row bucket.
  */
object Dedup {

  /** Exact dedup: group identical `textCol` bodies by md5 digest and
    * keep the smallest id as survivor. One shuffle on the digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature (k permutations over the distinct
    * lowercase-alpha token set). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
      col(idCol),
      minhashSignature(tokenSet(col(textCol)), k).as("sig"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * bandsOf rows per band; docs sharing any full band become candidate
    * pairs; candidates are verified with exact token-set Jaccard >=
    * threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, bandsOf: Int, threshold: Double): DataFrame = {
    require(k % bandsOf == 0, "k must divide into bands evenly")
    val toks = df.select(col(idCol).as("id"), tokenSet(col(textCol)).as("toks"))
    val sigs = toks.select(col("id"), minhashSignature(col("toks"), k).as("sig"))
    val nBands = k / bandsOf
    // (band index, band key) buckets; one shuffle co-locates candidates.
    val bands = sigs.select(
      col("id"),
      posexplode(array((0 until nBands).map { b =>
        concat_ws("_", (0 until bandsOf).map(r =>
          element_at(col("sig"), b * bandsOf + r + 1).cast("string")): _*)
      }: _*)).as(Seq("band_idx", "band_key")))
    val l = bands.select(col("band_idx"), col("band_key"), col("id").as("id_a"))
    val r = bands.select(col("band_idx"), col("band_key"), col("id").as("id_b"))
    val cand = l.join(r, Seq("band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("toks_a"), col("toks_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash signature (`bits`-bit, bit j from the j-th bit of the
    * portable 60-bit token hash; bit set iff more tokens vote 1 than 0).
    * Explode + hash-aggregate: partial sums combine map-side, so the
    * shuffle carries one row per (doc, bit-vector), not per token. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits <= 60, "token hash provides 60 usable bits")
    val perTok = df.select(col(idCol).as("id"),
      explode(tokenSet(col(textCol))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val votes = (0 until bits).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) > 0, 1).otherwise(-1)).as(s"v$j")
    }
    perTok.groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until bits).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Word n-gram Jaccard near-dup pairs inside a caller-chosen blocking
    * key (same-block pairs only — the idiomatic replacement for the
    * reference's collect_list-then-O(n^2)-UDF dedup, deduplicate.py:236-270). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockKey: Column, n: Int, threshold: Double): DataFrame = {
    val prepped = df.select(
      col(idCol).as("id"),
      blockKey.as("block"),
      array_distinct(shingles(tokens(col(textCol)), n)).as("sh"))
    val a = prepped.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prepped.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
