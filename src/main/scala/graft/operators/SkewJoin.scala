package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, which
  * covers most cases; explicit salting is the tool when one key is so
  * hot that even a single key's rows exceed an executor (AQE cannot
  * split within a key). Standard technique: spread the big side over
  * `saltFactor` sub-keys, replicate the small side across all salts,
  * join on (key, salt).
  *
  * The salt on the big side is deterministic (hash of a unique column)
  * so retried tasks produce identical output — never `rand()` in a
  * recomputable plan.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, bigSaltSource: String): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(bigSaltSource)), lit(saltFactor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
