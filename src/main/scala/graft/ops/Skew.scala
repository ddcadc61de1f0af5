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
}
