package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate skew mitigation. AQE's skew-join splitting (on in every
  * GraftSession) handles most cases at runtime; this utility is for
  * the pathological heavy-hitter shapes AQE can't fix — e.g. one key
  * holding 30% of a 100 TB fact table, where a single post-split
  * partition still exceeds an executor.
  */
object Skew {

  /** Salted inner equi-join: the big side's rows get a deterministic
    * salt in [0, nSalts) hashed from the whole row, the small side is
    * replicated once per salt, and the join key becomes (key, salt) —
    * a hot key's rows now spread over `nSalts` partitions instead of
    * one. Result set is EXACTLY the plain join's (every (key, salt)
    * pair is covered by the replication); cost is |small| × nSalts,
    * which is why the replicated side should be the small one.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      nSalts: Int = 16): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = big.withColumn(
      "_salt", pmod(hash(big.columns.map(col): _*), lit(nSalts)))
    val replicated = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Bloom-prefiltered inner equi-join — the runtime-filter pattern
    * for the shape where the dimension side is too large to broadcast
    * as ROWS but its join-KEY set fits a Bloom filter: build a Bloom
    * over the dim keys (distributed aggregation, only the ~MB-sized
    * bitset reaches the driver), broadcast it, and drop fact rows
    * whose key cannot match BEFORE the join's shuffle. At 100 TB the
    * win is shuffle volume: a 1% -selective dimension means ~99% of
    * the fact table never leaves its input partition. False positives
    * only let extra rows THROUGH to the exact join, so the result is
    * bit-identical to the plain join at any `fpp`.
    *
    * The probe is a deliberately thin non-codegen filter (a lambda
    * over the broadcast bitset) sitting directly on the scan; the
    * join itself stays whatever Catalyst picks (SMJ/shuffled-hash on
    * the surviving rows).
    */
  def bloomFilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))
    fact
      .filter(mightContain(col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }
}
