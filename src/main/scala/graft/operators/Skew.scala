package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (builder brief "salting for skew";
  * complements AQE's skew-join splitting when a handful of hot keys
  * dominate a 100 TB shuffle).
  *
  * Salting scatters each hot key across `buckets` reducer partitions:
  * the probe (big) side gets a deterministic per-row salt, the build
  * (small) side is replicated once per salt value, and the join key
  * becomes (key, salt). Row multiplicity is preserved exactly — each
  * (bigRow, smallRow) match pair exists for exactly one salt — so the
  * result is row-identical to the unsalted join (spec + oracle-checked).
  */
object Skew {

  /** Salted inner equi-join on `key`. `buckets` bounds the fan-out of
    * the replicated side (shuffle volume × buckets on the small side,
    * ÷ buckets per-reducer load on the hot keys). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // deterministic scatter: content hash of the big row (hot keys carry
    // distinct payloads, so they spread; identical rows co-locate, which
    // only affects balance, never correctness)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
