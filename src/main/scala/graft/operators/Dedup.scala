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
    df.where(col(textCol).isNotNull) // md5(NULL)=NULL would fuse all null docs
      .groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document MinHash signature (k permutations over the distinct
    * lowercase-alpha token set). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol),
        transform(tokenSet(col(textCol)), t => tokenHashMod(t)).as("__h"))
      .select(col(idCol), minhashFromHashes(col("__h"), k).as("sig"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * bandsOf rows per band; docs sharing any full band become candidate
    * pairs; candidates are verified with exact token-set Jaccard >=
    * threshold. Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, bandsOf: Int, threshold: Double): DataFrame = {
    require(k % bandsOf == 0, "k must divide into bands evenly")
    // hash each distinct token ONCE; signatures and the verification
    // Jaccard both work over the mod-P int64 hashes, re-distincted
    // AFTER hashing (the 31-bit ring can collide within a document,
    // and sortedJaccard requires set semantics — matching the oracle's
    // list_distinct). Kept sorted for the codegen'd merge-walk Jaccard.
    val toks = df.select(col(idCol).as("id"),
      sort_array(array_distinct(
        transform(tokenSet(col(textCol)), t => tokenHashMod(t)))).as("toks"))
    val sigs = toks.select(col("id"), minhashFromHashes(col("toks"), k).as("sig"))
    val nBands = k / bandsOf
    // One shuffle on (band index, band key) with NARROW rows (ids +
    // key only); candidate de-dup is a hash aggregate with map-side
    // partial combine; verification joins the token arrays back on id —
    // AQE broadcasts the per-doc side while it fits and falls back to a
    // shuffle join beyond the broadcast cap (a forced broadcast would
    // hard-fail at corpus scale).
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
        round(graft.functions.ArrayOps.sortedJaccard(col("toks_a"), col("toks_b")) + 1e-9, 6)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** SimHash signature (`bits`-bit, bit j from the j-th bit of the
    * portable 60-bit token hash; bit set iff more tokens vote 1 than 0,
    * i.e. 2*ones > n). Entirely per-row — token hashes are bound once
    * as a column, each bit is a filter-count over that array; zero
    * shuffles, pipelines into the scan. (An explode + partial-agg
    * variant would only win for documents too wide for one row.) */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits <= 60, "token hash provides 60 usable bits")
    df.select(col(idCol).as("id"),
        transform(tokenSet(col(textCol)), t => tokenHash(t)).as("h"))
      .where(size(col("h")) > 0)
      .select(col("id"),
        graft.functions.SimHashExpr.simhashFromHashes(col("h"), bits).as("simhash"))
  }

  /** Word n-gram Jaccard near-dup pairs inside a caller-chosen blocking
    * key (same-block pairs only — the idiomatic replacement for the
    * reference's collect_list-then-O(n^2)-UDF dedup, deduplicate.py:236-270). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockKey: Column, n: Int, threshold: Double): DataFrame = {
    // staged projections bind each intermediate as a column: the token
    // array is computed once per row, NOT re-evaluated by every
    // element_at inside the shingle lambda (higher-order lambdas do not
    // share subexpressions); shingles are md5-hashed to int64 and kept
    // sorted so the per-pair Jaccard is the codegen'd merge walk
    val prepped = df
      .select(col(idCol).as("id"), blockKey.as("block"),
        tokens(col(textCol)).as("toks"))
      .select(col("id"), col("block"), shingles(col("toks"), n).as("shs"))
      .select(col("id"), col("block"),
        sort_array(array_distinct(transform(col("shs"), s => tokenHash(s)))).as("sh"))
    val a = prepped.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prepped.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        round(graft.functions.ArrayOps.sortedJaccard(col("sh_a"), col("sh_b")) + 1e-9, 6)
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
