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
