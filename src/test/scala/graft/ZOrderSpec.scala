package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order clustering ([[graft.operators.Layout]]): Morton-code
  * correctness against a bit-twiddling reference, and the measurable
  * claim — a z-clustered layout's per-partition min/max stats prune
  * selective predicates on EITHER dimension, while a single-key range
  * layout prunes only its own key. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the bit-interleave reference") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (127L, 1L), (12345L, 54321L),
      (65535L, 65535L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == rows.map { case (a, b) => (a, b, mortonRef(a, b, 16)) }.toSet)
  }

  test("z-clustered partitions prune on either dimension; a-sorted layout cannot") {
    // uniform 128x128 key grid
    val df = spark.range(128L * 128L)
      .select((col("id") / 128).cast("long").as("a"), (col("id") % 128).as("b"))
    def boxes(clustered: DataFrame): Array[(Long, Long, Long, Long)] =
      clustered.withColumn("p", spark_partition_id()).groupBy("p")
        .agg(min("a").as("a0"), max("a").as("a1"),
          min("b").as("b0"), max("b").as("b1"))
        .select("a0", "a1", "b0", "b1")
        .as[(Long, Long, Long, Long)].collect()
    def hits(bx: Array[(Long, Long, Long, Long)], onB: Boolean,
        lo: Long, hi: Long): Int =
      bx.count { case (a0, a1, b0, b1) =>
        if (onB) b0 <= hi && b1 >= lo else a0 <= hi && a1 >= lo
      }
    val zBoxes = boxes(Layout.clusterByZOrder(df, col("a"), col("b"), 7, 16))
    val aBoxes = boxes(df.repartitionByRange(16, col("a"))
      .sortWithinPartitions(col("a")))
    assert(zBoxes.length == 16 && aBoxes.length == 16)
    // selective predicate on b (b < 8): the a-sorted layout scans ALL
    // partitions; the z layout's top interleaved bits confine b<8 to the
    // b6=b5=0 prefixes — ideally 4 of 16 partitions; range-sampled
    // boundaries straddle a few quadrants, so assert ≥2× pruning rather
    // than the ideal count
    assert(hits(aBoxes, onB = true, 0, 7) == 16)
    assert(hits(zBoxes, onB = true, 0, 7) <= 8,
      s"z layout failed to prune on b: ${hits(zBoxes, onB = true, 0, 7)}/16")
    // and the z layout still prunes on a too (a < 8 → a6=a5=0 prefixes)
    assert(hits(zBoxes, onB = false, 0, 7) <= 8)
  }

  test("skyline2D ≡ brute-force non-dominated set, with ties and duplicates") {
    val pts = Seq(
      (1L, 10.0, 1.0), (2L, 9.0, 2.0), (3L, 8.0, 3.0), // frontier chain
      (4L, 9.0, 1.5), // dominated by 2 (same x, smaller y)
      (5L, 7.0, 3.0), // dominated by 3 (same y, smaller x)
      (6L, 8.0, 3.0), // exact duplicate of 3 — both survive
      (7L, 1.0, 10.0), // frontier (max y)
      (8L, 0.5, 0.5)) // interior
    val df = pts.toDF("id", "x", "y").repartition(7)
    val got = graft.operators.Layout
      .skyline2D(df, col("id"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.map(_._1).toSet
    assert(got == want)
    assert(got == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("skyline2D on random points matches brute force across partitions") {
    val pts = (1 to 2000).map { i =>
      (i.toLong, ((i * 48271) % 1009).toDouble, ((i * 16807) % 997).toDouble)
    }
    val got = graft.operators.Layout
      .skyline2D(pts.toDF("id", "x", "y").repartition(16),
        col("id"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.map(_._1).toSet
    assert(got == want && got.nonEmpty)
  }

  test("clusterByZOrder preserves the rows exactly") {
    val df = spark.range(1000).select(col("id").as("a"), (col("id") * 7 % 97).as("b"))
    val out = Layout.clusterByZOrder(df, col("a"), col("b"), 10, 8)
    assert(out.columns.toSeq == Seq("a", "b"))
    assert(out.as[(Long, Long)].collect().toSet ==
      df.as[(Long, Long)].collect().toSet)
  }
}
