package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomBytes, BloomContains}

/** Bloom-filter membership gate — the scale spelling of "have we seen
  * this key before?" for the crawl-admission / URL-frontier shape: a
  * seen-set of n keys compresses to ~1.44·log2(1/fpp) bits per key
  * (≈ 1.2 MB per million keys at 1%), so the BIG side of an anti-join
  * never shuffles — it streams once through a codegen probe
  * ([[BloomContains]]) against a driver-built filter literal.
  *
  * Two consumption modes:
  *
  *  - [[bloomedAntiJoin]] — EXACT anti-join semantics at a fraction of
  *    the shuffle: the filter prunes definite-new rows in the scan
  *    (a Bloom "no" is authoritative — no false negatives), and only
  *    the maybe-seen candidates (true members + the fpp sliver) reach
  *    the exact anti-join shuffle. Identical output to a plain
  *    anti-join, verifiable by any engine.
  *  - [[mightContain]] raw — approximate gate when a false-drop rate
  *    of fpp is an acceptable trade for zero shuffle (admission
  *    de-dup of a crawl frontier); pair with the measured-FPR
  *    diagnostic row so the trade is visible, not assumed.
  *
  * Boundary (documented): the collected filter must fit a plan
  * literal — ~10^9 keys at 1% is ~1.2 GB and does NOT; shard the
  * seen-set (one filter per md5 shard, the FFD convention) or fall
  * back to the exact anti-join beyond ~10^8 keys per filter.
  */
object BloomGate {

  /** Standard sizing: bits for `n` keys at false-positive rate `fpp`. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0, s"n must be positive, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2sq = math.log(2) * math.log(2)
    math.max(64L, math.ceil(-n * math.log(fpp) / ln2sq).toLong)
  }

  /** Standard sizing: probe count for `numBits` over `n` keys. */
  def optimalK(n: Long, numBits: Long): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)

  /** One-pass distributed build over 64-bit key hashes: map-side
    * partial word-array ORs, one reduce. The buffer is the raw word
    * array; [[BloomBytes]] owns the bit math (shared with the probe
    * expression — build and probe cannot drift).
    */
  final class BloomAgg(numBits: Long, k: Int)
      extends Aggregator[Long, Array[Long], Array[Byte]] {
    private val numWords = ((numBits + 63) >>> 6).toInt
    override def zero: Array[Long] = new Array[Long](numWords)
    override def reduce(buf: Array[Long], hash: Long): Array[Long] = {
      BloomBytes.setBits(buf, numBits, k, hash)
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numWords) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Array[Byte] =
      BloomBytes.serialize(k, numBits, buf)
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder()
  }

  /** Build a serialized filter over `keys`' `keyCol` (any type —
    * hashed with xxhash64), sized for `expectedKeys` at `fpp`. The
    * result is an O(MB) byte array collected to the driver (the O(1)
    * centroid-literal round-trip class) for embedding as a plan
    * literal on the probe side.
    */
  def buildFilter(keys: DataFrame, keyCol: String, expectedKeys: Long, fpp: Double): Array[Byte] = {
    val numBits = optimalNumBits(expectedKeys, fpp)
    val k = optimalK(expectedKeys, numBits)
    val s = keys.sparkSession
    import s.implicits._
    keys.select(xxhash64(col(keyCol)).as("__h")).as[Long]
      .select(new BloomAgg(numBits, k).toColumn)
      .head()
  }

  /** Codegen membership probe of `keyCol` against a built filter. */
  def mightContain(filter: Array[Byte], keyCol: Column): Column =
    BloomContains(lit(filter), xxhash64(keyCol))

  /** EXACT left anti-join of `big` against `seen` on key equality,
    * Bloom-prefiltered: rows whose key the filter rules out short-cut
    * past the shuffle entirely (authoritative "no"); only maybe-seen
    * candidates join. Output ≡ `big EXCEPT keys-in-seen`, independent
    * of fpp — fpp only moves the shuffle size.
    */
  def bloomedAntiJoin(
      big: DataFrame,
      keyCol: String,
      seen: DataFrame,
      seenKeyCol: String,
      fpp: Double = 0.01): DataFrame = {
    // Pin the seen-set ONCE (r21): it otherwise recomputes for each of
    // its three full passes — the sizing count, the filter build, and
    // the exact anti-join's build side — and callers' seen-sets are
    // derived frames (canonicalization chains), so the recompute is a
    // regexp pass ×3. Memory is O(seen), the side this operator
    // already declares small (the big side is the one that never
    // shuffles); at the documented ~10^8-keys-per-filter boundary,
    // shard the seen-set anyway.
    val seenPinned = seen.localCheckpoint()
    val nSeen = math.max(1L, seenPinned.count())
    val filter = buildFilter(seenPinned, seenKeyCol, nSeen, fpp)
    val maybe = big.where(mightContain(filter, col(keyCol)))
      .join(seenPinned.select(col(seenKeyCol).as(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    big.where(!mightContain(filter, col(keyCol))).unionByName(maybe)
  }
}
