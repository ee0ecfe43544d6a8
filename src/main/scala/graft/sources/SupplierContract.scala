package graft.sources

/** The live-ingress seam: everything [[OpLogMicroBatchStream]] needs from a
  * replica of the logical binlog stream, as a minimal serializable contract
  * so a real client binding is a drop-in outside the sandbox.
  *
  * Semantics mirror the reference supplier
  * (mysql-replicator-supplier BinaryLogSupplier.java:142-256):
  *
  *  - A replica is addressed by an opaque string (here a file path; for a
  *    live binding, `host:port`). Replicas serve the SAME logical stream,
  *    so stream positions are portable across them — the precondition for
  *    the disconnect→next-host failover loop.
  *  - [[exists]]: is the replica reachable at all? A dead replica must be
  *    ineligible even for an empty stream (never "position 0 available").
  *  - [[purgedFloor]]: the oldest stream position the replica still
  *    retains — the binlog-retention boundary (purged GTIDs in the
  *    reference; `supplier.binlog.fallback.gtid.purged` decides whether a
  *    checkpoint below every floor fails loudly or resumes at the floor).
  *    Positions are ABSOLUTE: rotation advances the floor, never renumbers.
  *  - [[frontier]]: the replica's current end position (floor + retained
  *    events). Only COMPLETE events count — a mid-append torn record stays
  *    beyond the frontier so the next batch reads it whole.
  *  - [[read]]: the wire-encoded events in absolute range [from, until),
  *    decodable by [[OpLogCodec.decode]]. Runs on executors — bindings
  *    must be cheap to serialize (stateless object / small config).
  *
  * The stream built on top supplies, for every binding: failover ordering
  * (first caught-up replica wins), the monotone announce floor, purged-
  * retention fallback, and exactly-once via the engine offset log.
  */
trait SupplierContract extends Serializable {
  def exists(replica: String): Boolean
  def purgedFloor(replica: String): Long
  def frontier(replica: String): Long
  def read(replica: String, from: Long, until: Long): Iterator[String]

  /** Derived: first replica, in configured order, that exists and has
    * caught up to `atLeast` — the failover loop's eligibility rule. */
  final def replicaWith(replicas: Seq[String], atLeast: Long): Option[String] =
    replicas.find(r => exists(r) && frontier(r) >= atLeast)
}

/** File binding: a replica is a local append-only log file; the purged
  * floor lives in a `<path>.purged` sidecar. This is the sandbox stand-in
  * for the live MySQL binding (which would wrap a binlog client's
  * connect/fetch under the same four methods). */
object FileSupplier extends SupplierContract {

  override def exists(replica: String): Boolean = new java.io.File(replica).exists()

  /** Absent/garbled sidecar = nothing purged. */
  override def purgedFloor(replica: String): Long =
    try {
      val f = new java.io.File(replica + ".purged")
      if (!f.exists()) 0L
      else new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
    } catch { case _: Exception => 0L }

  /** Floor + newline-TERMINATED physical lines. Terminated only, because a
    * producer may be mid-append and a torn final line must stay outside
    * the frontier so the next micro-batch picks up the completed event
    * instead of the reader consuming (and permissively skipping) a
    * half-written record. */
  override def frontier(replica: String): Long = {
    val f = new java.io.File(replica)
    if (!f.exists()) 0L
    else purgedFloor(replica) + {
      val in = new java.io.BufferedInputStream(new java.io.FileInputStream(f))
      try {
        val buf = new Array[Byte](1 << 16)
        var n = 0L
        var r = in.read(buf)
        while (r > 0) {
          var i = 0
          while (i < r) { if (buf(i) == '\n') n += 1; i += 1 }
          r = in.read(buf)
        }
        n
      } finally in.close()
    }
  }

  /** Physical line i holds absolute position `purgedFloor + i`. */
  override def read(replica: String, from: Long, until: Long): Iterator[String] = {
    val purged = purgedFloor(replica)
    val src = scala.io.Source.fromFile(replica, "UTF-8")
    new Iterator[String] with AutoCloseable {
      private val it = src.getLines().zipWithIndex
        .filter { case (_, i) => i + purged >= from && i + purged < until }
        .map(_._1)
      private var open = true
      override def hasNext: Boolean = {
        val h = open && it.hasNext
        if (!h && open) close()
        h
      }
      override def next(): String = it.next()
      override def close(): Unit = if (open) { src.close(); open = false }
    }
  }
}
