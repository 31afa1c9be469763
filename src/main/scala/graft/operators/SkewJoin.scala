package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard remedy when ONE join key carries a
  * disproportionate share of the big side (a hot domain, a null-ish
  * sentinel key, web boilerplate) and the small side is too big or the
  * join too mid-plan for a broadcast: a plain shuffle join funnels the
  * hot key's entire mass into a single reducer partition, and that one
  * straggler IS the job's wall-clock at 100 TB.
  *
  * Construction: the big side gains a salt in `[0, salts)` that is NOT
  * a function of the join key (so a hot key's rows spread across
  * `salts` reducer partitions); the small side is replicated once per
  * salt value; the join key becomes `(keys…, salt)`. Row multiplicity
  * is exactly the plain join's: each big row matches the single small
  * replica carrying its salt. The salt assignment can be ANY
  * per-row value — correctness is salt-independent — so it is derived
  * from a hash of the big row's partition-local position, with no
  * requirement of stability across runs.
  *
  * Cost model: replication inflates the small side `salts`× (choose
  * `salts` ≈ the skew factor you need to flatten, not 1000), and the
  * shuffle moves the same big-side bytes as the plain join — just
  * spread evenly. AQE's skew-join split solves the same problem
  * adaptively when statistics surface it; the explicit salt is the
  * deterministic form for keys AQE under-detects (one mega-key inside
  * an otherwise balanced partition) and for sinks that need the spread
  * partitioning downstream of the join.
  *
  * `forceShuffle = true` adds a merge-join hint on the salted side so
  * the demonstration stays a shuffled join even when the small side
  * fits a broadcast (a broadcast join never skews — salting one would
  * be pure overhead; at production scale the small side exceeds the
  * broadcast threshold and the hint is unnecessary).
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `keys`, salt-spread to
    * `salts` reducer buckets per key. Output columns: big's then
    * small's non-key columns (the salt is internal).
    */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      forceShuffle: Boolean = false): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "keys must be non-empty")
    // xxhash64 over the partition-local row position decorrelates the
    // salt from row ORDER (position alone would stripe, which is fine
    // too, but hashing also decorrelates from any pre-existing
    // position-aligned structure in the data)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val hinted = if (forceShuffle) saltedBig.hint("merge") else saltedBig
    hinted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
