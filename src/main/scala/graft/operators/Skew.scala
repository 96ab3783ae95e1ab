package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4).
  *
  * When one join key carries a disproportionate share of rows (the
  * "hot key"), a plain shuffle join serializes that key's partition.
  * Salting splits each hot key into `salt` sub-keys: the skewed side
  * gets a random-but-deterministic salt per row, the other side is
  * replicated `salt` times. Shuffle parallelism on the hot key
  * becomes `salt` instead of 1, at the cost of replicating the small
  * side — the standard trade before AQE skew-join handles it, and
  * still required when the small side is too big to broadcast but
  * the key histogram is pathological.
  */
object Skew {

  /** Inner-join `big` (skewed) with `small` on bigKey === smallKey,
    * spreading each key over `salt` buckets. Deterministic salt
    * (hash of the whole row's key + a per-row discriminator) so
    * results are reproducible. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, discriminator: Column, salt: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(discriminator), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
