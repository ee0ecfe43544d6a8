package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Decoder for MySQL's binary JSON storage format (the representation a
  * row-based binlog delivers for JSON columns) to a compact JSON string —
  * the engine's analog of the reference's JSON cell decode (reference:
  * MysqlTypeDeserializer.java:99-109, which delegates to the binlog
  * client's JsonBinary.parseAsString). Implemented from the public MySQL
  * `json_binary` format documentation:
  *
  *   doc       := type(1) value
  *   object    := count size key-entries value-entries keys values
  *                (u16 fields in the small form, u32 in the large;
  *                 key lengths are always u16; offsets are relative to the
  *                 start of the object/array payload)
  *   value-entry := type(1) + offset-or-inlined-value
  *                (literal/int16/uint16 inline in both forms; int32/uint32
  *                 additionally inline in the large form)
  *   scalar types: 0x04 literal(null/true/false), 0x05 i16, 0x06 u16,
  *                 0x07 i32, 0x08 u32, 0x09 i64, 0x0a u64, 0x0b double,
  *                 0x0c string (LEB128 varint length + utf8 bytes)
  *
  * Output: compact JSON ({"k":v}, no whitespace), strings JSON-escaped,
  * u64 rendered unsigned. Opaque/custom types (0x0f: column-typed decimal/
  * date payloads) are out of scope for the wire shapes this engine ingests
  * and raise, rather than silently mis-render.
  */
object JsonBinaryAlgos {

  private final val SmallObject = 0x00
  private final val LargeObject = 0x01
  private final val SmallArray = 0x02
  private final val LargeArray = 0x03
  private final val Literal = 0x04
  private final val Int16 = 0x05
  private final val UInt16 = 0x06
  private final val Int32 = 0x07
  private final val UInt32 = 0x08
  private final val Int64 = 0x09
  private final val UInt64 = 0x0a
  private final val Dbl = 0x0b
  private final val Str = 0x0c

  def parseAsString(bytes: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder
    if (bytes.length == 0) sb.append("null")
    else renderValue(bytes, bytes(0) & 0xFF, 1, sb)
    UTF8String.fromString(sb.toString)
  }

  private def u16(b: Array[Byte], p: Int): Int = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], p: Int): Long =
    (u16(b, p).toLong) | (u16(b, p + 2).toLong << 16)
  private def i64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(p + i) & 0xFFL); i -= 1 }
    v
  }
  private def readUInt(b: Array[Byte], p: Int, wide: Boolean): Long =
    if (wide) u32(b, p) else u16(b, p).toLong

  /** LEB128 varint; returns (value, bytesConsumed). */
  private def varint(b: Array[Byte], p: Int): (Int, Int) = {
    var v = 0
    var shift = 0
    var i = p
    while ((b(i) & 0x80) != 0) {
      v |= (b(i) & 0x7F) << shift; shift += 7; i += 1
    }
    v |= (b(i) & 0x7F) << shift
    (v, i - p + 1)
  }

  private def renderValue(b: Array[Byte], tpe: Int, pos: Int, sb: java.lang.StringBuilder): Unit =
    tpe match {
      case SmallObject => renderObject(b, pos, wide = false, sb)
      case LargeObject => renderObject(b, pos, wide = true, sb)
      case SmallArray => renderArray(b, pos, wide = false, sb)
      case LargeArray => renderArray(b, pos, wide = true, sb)
      case Literal => sb.append((b(pos) & 0xFF) match {
        case 0 => "null"
        case 1 => "true"
        case 2 => "false"
        case other => throw new IllegalArgumentException(s"bad JSON literal $other")
      })
      case Int16 => sb.append(u16(b, pos).toShort.toInt)
      case UInt16 => sb.append(u16(b, pos))
      case Int32 => sb.append(u32(b, pos).toInt)
      case UInt32 => sb.append(u32(b, pos))
      case Int64 => sb.append(i64(b, pos))
      case UInt64 => sb.append(java.lang.Long.toUnsignedString(i64(b, pos)))
      case Dbl => sb.append(java.lang.Double.longBitsToDouble(i64(b, pos)))
      case Str =>
        val (len, consumed) = varint(b, pos)
        appendQuoted(b, pos + consumed, len, sb)
      case other =>
        throw new IllegalArgumentException(f"unsupported JSON binary type 0x$other%02x")
    }

  /** Inline-able in a value entry: literal/i16/u16 always; i32/u32 in the
    * large form. Inlined payload sits in the entry's offset field. */
  private def renderEntry(b: Array[Byte], base: Int, entryPos: Int, wide: Boolean,
                          sb: java.lang.StringBuilder): Unit = {
    val t = b(entryPos) & 0xFF
    val inline = t == Literal || t == Int16 || t == UInt16 ||
      (wide && (t == Int32 || t == UInt32))
    if (inline) renderValue(b, t, entryPos + 1, sb)
    else renderValue(b, t, base + readUInt(b, entryPos + 1, wide).toInt, sb)
  }

  private def renderObject(b: Array[Byte], base: Int, wide: Boolean,
                           sb: java.lang.StringBuilder): Unit = {
    val w = if (wide) 4 else 2
    val count = readUInt(b, base, wide).toInt
    val keyEntries = base + 2 * w
    val valEntries = keyEntries + count * (w + 2)
    sb.append('{')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      val keyOff = readUInt(b, keyEntries + i * (w + 2), wide).toInt
      val keyLen = u16(b, keyEntries + i * (w + 2) + w)
      appendQuoted(b, base + keyOff, keyLen, sb)
      sb.append(':')
      renderEntry(b, base, valEntries + i * (1 + w), wide, sb)
      i += 1
    }
    sb.append('}')
  }

  private def renderArray(b: Array[Byte], base: Int, wide: Boolean,
                          sb: java.lang.StringBuilder): Unit = {
    val w = if (wide) 4 else 2
    val count = readUInt(b, base, wide).toInt
    val valEntries = base + 2 * w
    sb.append('[')
    var i = 0
    while (i < count) {
      if (i > 0) sb.append(',')
      renderEntry(b, base, valEntries + i * (1 + w), wide, sb)
      i += 1
    }
    sb.append(']')
  }

  private def appendQuoted(b: Array[Byte], start: Int, len: Int,
                           sb: java.lang.StringBuilder): Unit = {
    val s = new String(b, start, len, java.nio.charset.StandardCharsets.UTF_8)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
