package graft.checkpoint

import scala.collection.immutable.SortedMap

/** Safe-checkpoint math over GTID sets — a pure-Scala re-expression of the
  * reference's gap-scan algorithm (reference:
  * supplier/mysql/binlog/gtid/GtidSetAlgebra.java:21-175, gap scan :149-175).
  *
  * A GTID set is rendered `"uuid:a-b:c-d,uuid2:e-f"`. Multiple pipeline tasks
  * each accumulate the GTIDs they have fully applied; the safe checkpoint is
  * the highest transaction id per server UUID such that EVERY transaction at
  * or below it has been applied by SOME task's accumulated set — i.e. the end
  * of the gap-free prefix of the union, starting from the minimum seen txn.
  *
  * Used driver-side when reporting end-to-end progress; it is deliberately
  * not a Spark operator (tiny state, order-sensitive fold).
  */
object GtidSetAlgebra {

  type Ranges = List[(Long, Long)] // inclusive, sorted, non-overlapping

  /** Parse `"uuid:1-5:7,uuid2:3-4"` into per-uuid normalized ranges. */
  def parse(gtidSet: String): Map[String, Ranges] = {
    if (gtidSet == null || gtidSet.trim.isEmpty) Map.empty
    else {
      gtidSet.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { part =>
        val pieces = part.split(':')
        val uuid = pieces.head
        val ranges = pieces.tail.iterator.map { r =>
          r.split('-') match {
            case Array(a)    => (a.trim.toLong, a.trim.toLong)
            case Array(a, b) => (a.trim.toLong, b.trim.toLong)
            case _ => throw new IllegalArgumentException(s"bad GTID range '$r' in '$part'")
          }
        }.toList
        uuid -> normalize(ranges)
      }.toMap.foldLeft(Map.empty[String, Ranges]) { case (acc, (u, rs)) =>
        acc.updated(u, merge(acc.getOrElse(u, Nil), rs))
      }
    }
  }

  /** Sort + coalesce adjacent/overlapping ranges. */
  def normalize(ranges: List[(Long, Long)]): Ranges = {
    val sorted = ranges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.sortBy(_._1)
    sorted.foldLeft(List.empty[(Long, Long)]) {
      case (Nil, r) => List(r)
      case ((s, e) :: tail, (a, b)) =>
        if (a <= e + 1) (s, math.max(e, b)) :: tail else (a, b) :: (s, e) :: tail
    }.reverse
  }

  def merge(a: Ranges, b: Ranges): Ranges = normalize(a ++ b)

  def union(sets: Iterable[Map[String, Ranges]]): Map[String, Ranges] =
    sets.foldLeft(Map.empty[String, Ranges]) { (acc, s) =>
      s.foldLeft(acc) { case (m, (u, rs)) => m.updated(u, merge(m.getOrElse(u, Nil), rs)) }
    }

  /** The gap-free prefix end: highest txn id reachable from the minimal seen
    * transaction without a hole (reference gap scan,
    * GtidSetAlgebra.java:149-175). Normalized ranges make this the end of the
    * first range. Returns None for an empty set. */
  def gapFreePrefixEnd(ranges: Ranges): Option[Long] = ranges.headOption.map(_._2)

  /** The whole gap-free prefix (lo, hi) — the actual first uninterrupted
    * range, as the reference's extractFinalRanges reports it. Claiming
    * `1-hi` when the prefix starts above 1 would assert txns 1..lo-1
    * applied and let a resume skip them. */
  def gapFreePrefix(ranges: Ranges): Option[(Long, Long)] = ranges.headOption

  /** Safe checkpoint across tasks: union all per-task applied sets, then for
    * each server UUID take the gap-free prefix (lo, hi). */
  def safeCheckpoint(taskSets: Iterable[String]): Map[String, (Long, Long)] = {
    val merged = union(taskSets.map(parse))
    merged.flatMap { case (u, rs) => gapFreePrefix(rs).map(u -> _) }
  }

  /** Render a safe checkpoint back to GTID-set string form — the actual
    * applied prefix `uuid:lo-hi`, never a hard-coded `1-`. Deterministic
    * uuid order. */
  def render(safe: Map[String, (Long, Long)]): String =
    SortedMap.from(safe).map { case (u, (lo, hi)) => s"$u:$lo-$hi" }.mkString(",")
}
