package graft.functions

import java.nio.ByteBuffer

/** Shared magic/version framing for the sketch wire formats (KMV /
  * SpaceSaving / KLL). The merge aggregates and `*_of` expressions accept
  * arbitrary user-supplied BINARY columns — stored sketch tables, possibly
  * written by an older build or by something that is not a sketch at all —
  * so deserialization validates an explicit header and every length field
  * before trusting it, failing with a descriptive error instead of a raw
  * `BufferUnderflowException` or silently garbage estimates. */
private[graft] object SketchWire {
  final val Version = 1
  final val HeaderBytes = 8 // magic int + version int

  final val KllMagic = 0x474b4c31 // "GKL1"
  final val KmvMagic = 0x474b4d31 // "GKM1"
  final val SsvMagic = 0x47535331 // "GSS1"

  def putHeader(buf: ByteBuffer, magic: Int): Unit = {
    buf.putInt(magic); buf.putInt(Version)
  }

  private val KnownMagics = Set(KllMagic, KmvMagic, SsvMagic)

  /** Headerless version-0 payloads are accepted only behind this explicit
    * opt-in (default strict): the v0 sniff necessarily treats ANY payload
    * whose first int is not a known magic as a candidate body, so a
    * corrupted or non-sketch BINARY whose leading fields happen to pass
    * the plausibility checks would yield silently-wrong estimates —
    * contradicting the module's fail-loud contract. Set it per session
    * (`spark.conf.set(...)`, propagated to executors with the other SQL
    * confs) only while migrating a pre-round-7 stored sketch table, then
    * rewrite the table framed and drop the flag. */
  final val LegacyV0Conf = "spark.graft.sketch.allowLegacyV0"
  private def legacyV0Allowed: Boolean =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(LegacyV0Conf, "false").toBoolean
    catch { case scala.util.control.NonFatal(_) => false }

  /** Validate (and consume) the header — or recognize a HEADERLESS legacy
    * payload and leave the buffer untouched for the v0 body parser.
    *
    * The magic/version header arrived in round 7; stored sketch tables are
    * the feature's stated use case, so BINARYs persisted by a pre-header
    * build must stay readable. Sniff rule: first int == this family's
    * magic → consume header, enforce version; first int == a DIFFERENT
    * family's magic → hard "bad magic" error (cross-family misuse is never
    * a legacy payload); anything else → treat as a version-0 body starting
    * at offset 0 (the body format never changed). The sniff cannot
    * misclassify a real v0 payload: every v0 body opens with a count /
    * k / evicted-floor field orders of magnitude below any magic value
    * (0x474b4c31 ≈ 1.19e9, vs k ≤ 2²⁴ and counts bounded by payload
    * length, which `need` then enforces). */
  def checkHeader(buf: ByteBuffer, magic: Int, name: String): Unit = {
    if (buf.remaining() < 4)
      fail(name, s"truncated payload (${buf.remaining()} bytes)")
    val m = buf.getInt(buf.position()) // absolute peek, nothing consumed
    if (m == magic) {
      if (buf.remaining() < HeaderBytes)
        fail(name, s"truncated header (${buf.remaining()} bytes)")
      buf.getInt // magic
      val v = buf.getInt
      if (v != Version)
        fail(name, s"unsupported wire version $v (this build reads version $Version)")
    } else if (KnownMagics.contains(m)) {
      fail(name, f"bad magic 0x$m%08x (expected 0x$magic%08x) — not a $name sketch")
    } else if (!legacyV0Allowed) {
      fail(name, f"bad magic 0x$m%08x (expected 0x$magic%08x) — not a framed " +
        s"$name sketch. If this is a headerless pre-v1 payload, set " +
        s"$LegacyV0Conf=true for the migration read.")
    }
    // else: opted-in headerless version-0 legacy body; parse from offset 0
  }

  /** Guard a length field read from the wire before allocating/looping on it. */
  def need(buf: ByteBuffer, bytes: Long, name: String, what: String): Unit =
    if (bytes < 0 || bytes > buf.remaining())
      fail(name, s"$what claims $bytes bytes but only ${buf.remaining()} remain")

  def fail(name: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$name sketch wire: $msg")
}
