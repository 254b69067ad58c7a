package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, FloatType,
  IntegerType, LongType, ShortType}

/** A built Bloom filter: the bitset, the hash count, and the CANONICAL
  * key type it was hashed with — bundled because all three must match
  * between build and probe. xxhash64 tags the input type (INT 1 and
  * BIGINT 1 hash differently), and a numHashes drift probes bits that
  * were never set; either mismatch produces silent FALSE NEGATIVES,
  * breaking the module's identical-to-the-unpruned-join contract.
  * Construct via [[BloomJoin.buildBits]]. */
final case class BloomFilter private[operators] (
    bits: Array[Long], numHashes: Int, keyType: DataType) {
  require(bits.nonEmpty, "empty bitset")

  /** Membership test Column: true if `key` MIGHT be in the build set
    * (no false negatives; false-positive rate set by size/numHashes).
    * The key is cast to the filter's canonical type, so an int probe
    * column tests a long-built filter correctly. */
  def mightContain(key: Column): Column = {
    val numBits = bits.length * 64
    val arr = typedlit(bits.toSeq)
    BloomJoin.positions(key.cast(keyType), numBits, numHashes)
      .map { p =>
        element_at(arr, floor(p / 64).cast("int") + 1)
          .bitwiseAND(BloomJoin.bitShift(pmod(p, lit(64L)))) =!= lit(0L)
      }
      .reduce(_ && _)
  }
}

/** Explicit Bloom-filter semi-join reduction: build a compact bitset
  * over the (already filtered, small) build side's join keys, then
  * prune the probe side with a pure-Column membership test BEFORE its
  * shuffle. The exact join that follows removes the false positives,
  * so the final answer is identical to the unpruned join — the filter
  * only cuts the rows that travel.
  *
  * Why explicit when AQE has runtime filters: a materialized bitset
  * can be REUSED across many probe queries against the same build set
  * (the "dimension of the day" shape), and its size/#hashes are under
  * caller control. At 100 TB the win is shuffle bytes: probe rows that
  * cannot match never leave the scan stage.
  *
  * Plan shape: the membership test is k `xxhash64` + shift/AND ops on
  * a literal long array — whole-stage-codegen friendly, no UDF, no
  * driver broadcast variable (the bits ride in the plan as a literal).
  * Building the bitset runs one job over the build side (explode k
  * positions → OR-combine per 64-bit word → collect ≤ numBits/64
  * longs); callers invoke it at execution time, like any action.
  */
object BloomJoin {

  /** Bitset size for `nKeys` build-side keys: next power of two >=
    * bitsPerKey*nKeys (10 bits/key with 4 hashes ≈ 1-2% false-positive
    * rate), floored at one word and capped at 2^27 bits = 16 MB of
    * longs — still comfortably driver/plan-literal sized. A FIXED size
    * saturates silently as the build side grows (e.g. 2^15 bits over
    * 30k keys sets ~3.7 bits per key → ~90% false positives: the probe
    * pays k hashes per row and prunes nothing), so callers should size
    * from a cheap count of the filtered build side. */
  def sizedBits(nKeys: Long, bitsPerKey: Int = 10): Int = {
    require(nKeys >= 0 && bitsPerKey >= 1)
    val want = nKeys.max(1L) * bitsPerKey
    val cap = 1 << 27
    if (want >= cap) cap
    else math.max(64, java.lang.Long.highestOneBit(want * 2 - 1).toInt)
  }

  /** Widths collapse before hashing, so the int-keyed fact table and
    * the long-keyed dim (or a testdata regeneration that flips a key's
    * width — TableContractSpec deliberately allows int OR long) build
    * and probe identical bit positions. Non-numeric types must match
    * exactly — casting e.g. a string key to long would null it and
    * degenerate the filter silently. */
  private def canonType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case other => other
  }

  /** Build the filter: one aggregation job over the build-side keys.
    * Driver state is numBits/64 longs (bounded by construction). */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int, numHashes: Int): BloomFilter = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      "numBits must be a power of two >= 64 (one full word)")
    require(numHashes >= 1 && numHashes <= 16)
    val kt = canonType(keys.schema(keyCol).dataType)
    val words = numBits / 64
    val pos = positions(col(keyCol).cast(kt), numBits, numHashes)
    val rows = keys
      .select(explode(array(pos: _*)).as("pos"))
      .select(floor(col("pos") / 64).cast("int").as("word"),
        bitShift(pmod(col("pos"), lit(64L))).as("mask"))
      .groupBy("word")
      .agg(bit_or(col("mask")).as("mask"))
      .collect()
    val bits = new Array[Long](words)
    rows.foreach(r => bits(r.getAs[Int]("word")) = r.getAs[Long]("mask"))
    BloomFilter(bits, numHashes, kt)
  }

  /** Prune `probe` to rows whose key might be in the build set. The
    * probe key must canonicalize to the filter's key type (int/long
    * and float/double width drift is absorbed; a string-vs-numeric
    * mismatch is a caller bug and fails loudly). */
  def pruned(probe: DataFrame, keyCol: String, filter: BloomFilter): DataFrame = {
    val kt = canonType(probe.schema(keyCol).dataType)
    require(kt == filter.keyType,
      s"bloom probe key $keyCol canonicalizes to ${kt.sql} but the filter was " +
        s"built over ${filter.keyType.sql} — hashes would disagree (false negatives)")
    probe.where(filter.mightContain(col(keyCol)))
  }

  /** k bit positions per key: xxhash64 seeded by the hash index. */
  private[operators] def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(lit(i), key), lit(numBits.toLong)))

  /** 1L << shift for a COLUMN shift amount (the `functions.shiftleft`
    * overload only takes a literal Int shift). */
  private[operators] def bitShift(shift: Column): Column =
    call_function("shiftleft", lit(1L), shift.cast("int"))
}
