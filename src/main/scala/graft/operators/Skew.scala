package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DetHash

/** Skew-mitigation utilities.
  *
  * AQE's runtime skew-join splitting handles most cases; explicit salting
  * remains the tool when one side must pre-aggregate per key or when a
  * single hot key exceeds what partition splitting can balance (billions of
  * rows under one key at 100 TB). The salt here is md5-derived from a
  * caller-named unique column — deterministic, so results are reproducible
  * and oracle-comparable (no rand()).
  */
object Skew {

  /** Deterministic salt in [0, buckets) from a unique id column. */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(DetHash.base60(idCol.cast("string")), lit(buckets)).cast("int")

  /** Inner equi-join with the fact side salted and the (smaller) build side
    * replicated `buckets`× — the hot fact key spreads over `buckets`
    * shuffle partitions instead of one. Row-identical to
    * `fact.join(build, fact(key) === build(key))`, including rows whose
    * `factId` is NULL: the salt coalesces to bucket 0 (md5 of NULL is NULL,
    * and a NULL salt would never equi-match the replicated build side,
    * silently dropping the row).
    *
    * @param factId unique fact column that seeds the deterministic salt
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: String,
                 buildKey: String, factId: String, buckets: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      coalesce(salt(col(factId), buckets), lit(0)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<int>")))
    salted
      .join(replicated,
        salted(factKey) === replicated(buildKey)
          && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
