package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** MySQL GEOMETRY cell decode. MySQL stores spatial values as a 4-byte
  * little-endian SRID followed by standard OGC WKB; the reference enumerates
  * the geometry type family (reference: DataType.java:50-58) but
  * deserializes it through the UNKNOWN/hex path — this engine keeps that
  * hex parity in the row decoder and additionally offers the typed surface:
  * WKB → WKT text, implemented from the public OGC WKB specification
  * (byte-order flag per geometry, u32 type code, IEEE-754 doubles).
  *
  * Supported: POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING,
  * MULTIPOLYGON, GEOMETRYCOLLECTION, either endianness, nested collections.
  */
object GeometryAlgos {

  /** MySQL wire form: 4-byte SRID prefix + WKB. */
  def mysqlGeometryToWkt(bytes: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder
    renderGeometry(bytes, 4, sb)
    UTF8String.fromString(sb.toString)
  }

  /** Plain WKB (no SRID prefix) → WKT. */
  def wkbToWkt(bytes: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder
    renderGeometry(bytes, 0, sb)
    UTF8String.fromString(sb.toString)
  }

  private final class Cursor(val b: Array[Byte], var p: Int) {
    var little: Boolean = true
    def readByteOrder(): Unit = { little = b(p) == 1; p += 1 }
    def u32(): Long = {
      val v =
        if (little)
          (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) | ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
        else
          (b(p + 3) & 0xFFL) | ((b(p + 2) & 0xFFL) << 8) | ((b(p + 1) & 0xFFL) << 16) | ((b(p) & 0xFFL) << 24)
      p += 4
      v
    }
    def dbl(): Double = {
      var bits = 0L
      var i = 0
      while (i < 8) {
        val idx = if (little) p + 7 - i else p + i
        bits = (bits << 8) | (b(idx) & 0xFFL)
        i += 1
      }
      p += 8
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  private def renderGeometry(bytes: Array[Byte], start: Int, sb: java.lang.StringBuilder): Unit =
    renderOne(new Cursor(bytes, start), sb)

  private def renderOne(c: Cursor, sb: java.lang.StringBuilder): Unit = {
    c.readByteOrder()
    val tpe = c.u32()
    tpe match {
      case 1 => sb.append("POINT("); coord(c, sb); sb.append(')')
      case 2 => sb.append("LINESTRING"); ring(c, sb)
      case 3 =>
        sb.append("POLYGON(")
        val rings = c.u32()
        var i = 0L
        while (i < rings) { if (i > 0) sb.append(','); ring(c, sb); i += 1 }
        sb.append(')')
      case 4 =>
        // WKB multipoint members are full point geometries (order+type)
        sb.append("MULTIPOINT(")
        val n = c.u32()
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          c.readByteOrder(); c.u32() // member header (type 1)
          coord(c, sb)
          i += 1
        }
        sb.append(')')
      case 5 =>
        sb.append("MULTILINESTRING(")
        val n = c.u32()
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          c.readByteOrder(); c.u32()
          ring(c, sb)
          i += 1
        }
        sb.append(')')
      case 6 =>
        sb.append("MULTIPOLYGON(")
        val n = c.u32()
        var i = 0L
        while (i < n) {
          if (i > 0) sb.append(',')
          c.readByteOrder(); c.u32()
          sb.append('(')
          val rings = c.u32()
          var r = 0L
          while (r < rings) { if (r > 0) sb.append(','); ring(c, sb); r += 1 }
          sb.append(')')
          i += 1
        }
        sb.append(')')
      case 7 =>
        sb.append("GEOMETRYCOLLECTION(")
        val n = c.u32()
        var i = 0L
        while (i < n) { if (i > 0) sb.append(','); renderOne(c, sb); i += 1 }
        sb.append(')')
      case other => throw new IllegalArgumentException(s"unsupported WKB geometry type $other")
    }
  }

  private def ring(c: Cursor, sb: java.lang.StringBuilder): Unit = {
    sb.append('(')
    val n = c.u32()
    var i = 0L
    while (i < n) { if (i > 0) sb.append(','); coord(c, sb); i += 1 }
    sb.append(')')
  }

  private def coord(c: Cursor, sb: java.lang.StringBuilder): Unit = {
    appendNum(c.dbl(), sb); sb.append(' '); appendNum(c.dbl(), sb)
  }

  /** Integral coordinates render without a decimal part (WKT convention). */
  private def appendNum(v: Double, sb: java.lang.StringBuilder): Unit =
    if (v == scala.math.rint(v) && scala.math.abs(v) < 1e15) sb.append(v.toLong)
    else sb.append(v)

  /** Encode POINT(x y) in the MySQL wire form (SRID 0 + LE WKB) — fixture
    * builder for tests and synthesized queries. */
  def mysqlPointBytes(x: Double, y: Double): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(25).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0)          // SRID
    bb.put(1.toByte)      // little-endian
    bb.putInt(1)          // POINT
    bb.putDouble(x).putDouble(y)
    bb.array()
  }
}
