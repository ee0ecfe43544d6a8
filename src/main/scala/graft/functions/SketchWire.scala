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

  def checkHeader(buf: ByteBuffer, magic: Int, name: String): Unit = {
    if (buf.remaining() < HeaderBytes)
      fail(name, s"truncated header (${buf.remaining()} bytes)")
    val m = buf.getInt
    if (m != magic)
      fail(name, f"bad magic 0x$m%08x (expected 0x$magic%08x) — not a $name sketch")
    val v = buf.getInt
    if (v != Version)
      fail(name, s"unsupported wire version $v (this build reads version $Version)")
  }

  /** Guard a length field read from the wire before allocating/looping on it. */
  def need(buf: ByteBuffer, bytes: Long, name: String, what: String): Unit =
    if (bytes < 0 || bytes > buf.remaining())
      fail(name, s"$what claims $bytes bytes but only ${buf.remaining()} remain")

  def fail(name: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$name sketch wire: $msg")
}
