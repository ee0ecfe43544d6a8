package graft.checkpoint

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator folding per-task applied GTID-set strings into the
  * cluster-wide safe checkpoint — the order-insensitive distributed form of
  * the reference's checkpoint math (reference: GtidSetAlgebra.java:21-175,
  * CoordinatorCheckpointApplier.java:47-97): union all applied sets, then
  * take each server's gap-free prefix end.
  *
  * Usable as `functions.udaf(SafeCheckpointAggregator)` in any groupBy, or
  * via `Dataset.select(SafeCheckpointAggregator.toColumn)` on a typed
  * Dataset[String]. Merge is associative+commutative (range-set union), so
  * Spark partial-aggregates it map-side. The finished value renders the
  * actual gap-free prefix `uuid:lo-hi` (never a hard-coded `1-`), so a
  * resume from it cannot skip transactions below the first applied range.
  */
object SafeCheckpointAggregator extends Aggregator[String, String, String] {

  override def zero: String = ""

  override def reduce(buf: String, gtidSet: String): String = merge(buf, gtidSet)

  override def merge(a: String, b: String): String = {
    val union = GtidSetAlgebra.union(Seq(GtidSetAlgebra.parse(a), GtidSetAlgebra.parse(b)))
    // render the merged ranges exactly (not just the safe prefix) so further
    // merges see every applied range
    union.toSeq.sortBy(_._1).map { case (u, rs) =>
      u + ":" + rs.map { case (s, e) => if (s == e) s.toString else s"$s-$e" }.mkString(":")
    }.mkString(",")
  }

  override def finish(buf: String): String =
    GtidSetAlgebra.render(GtidSetAlgebra.safeCheckpoint(Seq(buf)))

  override def bufferEncoder: Encoder[String] = Encoders.STRING
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
