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
}
