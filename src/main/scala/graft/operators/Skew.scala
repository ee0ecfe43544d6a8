package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-phase salted aggregate for hot keys.
  *
  * At 100 TB a handful of hot keys (one giant transaction, one hot table)
  * can pin a single reducer. Phase 1 aggregates on (key, salt) — the hot
  * key's rows spread over `saltBuckets` reducers; phase 2 merges the tiny
  * per-salt partials on the key. AQE's skew-join handling covers joins;
  * this covers aggregations, where AQE cannot split a single group.
  *
  * The merge expression must be the aggregate's combiner (sum→sum,
  * count→sum, min→min, max→max) — the same algebra partial aggregation
  * relies on.
  */
object Skew {

  /** Salted count per key. */
  def saltedCount(df: DataFrame, keyCol: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(rand(seed = 7) * 1000000), lit(saltBuckets.toLong)))
      .groupBy(keyCol.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("cnt"))

  /** Salted sum of a decimal-cast value per key. */
  def saltedSum(df: DataFrame, keyCol: Column, valueCol: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(rand(seed = 7) * 1000000), lit(saltBuckets.toLong)))
      .groupBy(keyCol.as("key"), col("__salt"))
      .agg(sum(valueCol.cast("decimal(18,2)")).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("total"))

  /** Salted equi-join for skewed FACT keys: the fact side gets a random
    * salt in [0, saltBuckets), the dim side is REPLICATED once per salt
    * value, and the join runs on (key, salt) — a hot fact key's rows land
    * on `saltBuckets` reducers instead of one. Output is BIT-IDENTICAL to
    * the plain inner join (each fact row joins exactly the one dim replica
    * carrying its salt), which keeps the operator oracle-checkable.
    *
    * This is the static form of what AQE's skew-join split does at
    * runtime — still needed when AQE is off (streaming micro-batches,
    * non-adaptive plans) or when the skew is known ahead of time and the
    * replicate-factor should be pinned. Dim-side cost: ×saltBuckets rows
    * through the exchange, so salt only as much as the hottest key needs. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column,
      dimKey: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(rand(seed = 7) * 1000000), lit(saltBuckets.toLong)))
    val replicated = dim.crossJoin(
      fact.sparkSession.range(saltBuckets).select(col("id").as("__salt")))
    salted.join(replicated,
        factKey === dimKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
