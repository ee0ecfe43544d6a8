package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering via Z-order
  * (Morton) interleaving — the technique behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` and the classic UB-tree layout (Bayer,
  * "The Universal B-Tree", 1997).
  *
  * Why it matters at 100 TB: range-partitioning on ONE key gives file-level
  * min/max pruning on that key only; predicates on a second key scan
  * everything. Interleaving the bits of both keys makes files cover small
  * HYPER-RECTANGLES of the key space, so min/max stats prune on EITHER
  * dimension — the scan cost of a selective predicate on any clustered
  * column drops from "all files" to O(files intersecting the query box).
  * ZOrderSpec measures exactly that pruning ratio on a uniform grid.
  */
object Layout {

  /** Morton code of two non-negative keys, `bits` bits each, bit i of `a`
    * at position 2i, bit i of `b` at 2i+1 — pure integer arithmetic
    * (shift/mask/or), codegen-friendly, engine-portable. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** 2-D skyline (Pareto frontier, maximize both dims; Börzsönyi et al.,
    * "The Skyline Operator", ICDE '01): points not dominated by any other
    * (q.x ≥ p.x ∧ q.y ≥ p.y with one strict). Exact duplicates survive
    * together (neither strictly dominates).
    *
    * Distributed shape — ONE range exchange, no n² join, no global sort:
    * range-partition on x descending (equal x never splits across
    * partitions), so every partition's dominators from elsewhere live in
    * EARLIER partitions and are summarized by one number — the prefix max
    * of per-partition max-y (O(#partitions) on the driver, the shardAssign
    * bounded-collect class; the pass reuses the pinned exchange's shuffle
    * files). Each partition then runs the classic sorted sweep locally:
    * an equal-x group survives iff its max y strictly exceeds the running
    * max y of strictly-greater-x points. Output is the exact skyline; the
    * oracle is the NOT EXISTS anti-join. Worst case (anti-correlated
    * dims) a skyline is O(n) — output-bound like any frontier query. */
  def skyline2D(df: DataFrame, idCol: Column, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.{GraftBridge, Row}
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions.max(1)
    val narrow = df
      .select(idCol.as("__id"), xCol.cast("double").as("__x"), yCol.cast("double").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .repartitionByRange(parts, col("__x").desc)
    val schema = narrow.schema
    val rdd = narrow.queryExecution.toRdd
    val nParts = rdd.getNumPartitions
    val maxes = rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Double.NegativeInfinity
      while (it.hasNext) { val y = it.next().getDouble(2); if (y > m) m = y }
      Iterator((pid, m))
    }.collect().toMap
    val prefix = new Array[Double](nParts.max(1))
    var acc = Double.NegativeInfinity
    var p = 0
    while (p < nParts) {
      prefix(p) = acc
      val m = maxes.getOrElse(p, Double.NegativeInfinity)
      if (m > acc) acc = m
      p += 1
    }
    val prefixB = spark.sparkContext.broadcast(prefix)
    val sorted = GraftBridge.internalDf(spark, rdd, schema)
      .sortWithinPartitions(col("__x").desc, col("__y").desc)
      .withColumn("__pid", spark_partition_id())
    val enc = org.apache.spark.sql.Encoders.row(sorted.schema)
    sorted.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty[Row]
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        var maxHigher = Double.NegativeInfinity
        var started = false
        var curX = 0.0
        var groupMax = 0.0
        rows.foreach { r =>
          if (!started) maxHigher = prefixB.value(r.getInt(3))
          val x = r.getDouble(1)
          val y = r.getDouble(2)
          if (!started || x != curX) {
            if (started && groupMax > maxHigher) maxHigher = groupMax
            curX = x
            groupMax = y // first row of the group carries its max (y desc)
            started = true
          }
          if (y == groupMax && groupMax > maxHigher) out += r
        }
        out.iterator
      }
    }(enc)
      .select(col("__id").as("id"), col("__x").as("x"), col("__y").as("y"))
  }

  /** Cluster a DataFrame for two-dimensional pruning: range-partition and
    * locally sort by the Morton code of (a, b). Each output partition then
    * covers a compact box of the (a, b) space, so per-file min/max stats
    * prune selective predicates on EITHER column. The Z column is dropped —
    * the value is the physical order, not a new attribute. */
  def clusterByZOrder(df: DataFrame, a: Column, b: Column, bits: Int,
      numPartitions: Int): DataFrame =
    df.withColumn("__z", zValue(a, b, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
