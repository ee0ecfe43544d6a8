package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DataSource V2 micro-batch source over an append-only op log —
  * the concrete shape of the live-binlog adapter (reference:
  * BinaryLogSupplier, SURVEY §2.1 S1): a MySQL client would append events to
  * this log (or the stream would wrap the client directly); offsets are
  * line positions, exactly the binlog file+pos model.
  *
  * Deliberate design points:
  *  - ONE input partition per micro-batch: a binlog is a total order; the
  *    pipeline re-partitions downstream (Partitioner stage), not the source.
  *  - Offsets are durable line counts; the engine's offset log provides
  *    resume (replaces ZooKeeper checkpoint storage).
  *  - Line format: tab-separated with url-encoded map entries — trivially
  *    appendable by any producer.
  *
  * Usage: `spark.readStream.format("graft-oplog").option("path", f).load()`
  * (schema = OpSource.opSchema). `Sinks`-side exactly-once comes from
  * foreachBatch idempotence + engine commit log.
  */
class OpLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-oplog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = OpSource.opSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OpLogTable(properties.get("path"))
}

final class OpLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-oplog($path)"
  override def schema(): StructType = OpSource.opSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = OpSource.opSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new OpLogMicroBatchStream(path)
      }
    }
}

final case class OpLogOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

final class OpLogMicroBatchStream(path: String) extends MicroBatchStream {
  /** Count only newline-TERMINATED lines: a producer may be mid-append, and
    * a torn final line must stay outside the offset so the next micro-batch
    * picks up the completed event instead of the reader consuming (and
    * permissively skipping) a half-written record. */
  private def lineCount(): Long = {
    val f = new java.io.File(path)
    if (!f.exists()) 0L
    else {
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

  override def initialOffset(): Offset = OpLogOffset(0L)
  override def latestOffset(): Offset = OpLogOffset(lineCount())
  override def deserializeOffset(json: String): Offset = OpLogOffset(json.toLong)
  override def commit(end: Offset): Unit = () // engine offset log is the truth
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[OpLogOffset].line
    val e = end.asInstanceOf[OpLogOffset].line
    if (e <= s) Array.empty else Array(OpLogPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[OpLogPartition]
      new OpLogPartitionReader(p.path, p.from, p.until)
    }
}

final case class OpLogPartition(path: String, from: Long, until: Long) extends InputPartition

/** Reads lines [from, until) of the log and decodes them to Op rows. */
final class OpLogPartitionReader(path: String, from: Long, until: Long)
    extends PartitionReader[InternalRow] {

  private val src = scala.io.Source.fromFile(path, "UTF-8")
  private val it = src.getLines().zipWithIndex
    .filter { case (_, i) => i >= from && i < until }.map(_._1)
  private var current: InternalRow = _

  /** Permissive decode: a corrupt line is logged and skipped rather than
    * killing the stream — a poisoned binlog entry must not wedge the
    * pipeline (the reference's equivalent is its exception handler +
    * requeue; here the offset log already guarantees we never re-read it). */
  override def next(): Boolean = {
    while (it.hasNext) {
      val line = it.next()
      try { current = OpLogCodec.decode(line); return true }
      catch { case e: Exception =>
        System.err.println(s"[graft-oplog] skipping undecodable line: ${e.getMessage}")
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}

/** Line codec: kind, txnId, xxid, eventId, tsMs, table, rowKey, before,
  * after — tab-separated; maps as `k=v` pairs joined with `&`, url-encoded. */
object OpLogCodec {
  import java.net.{URLDecoder, URLEncoder}

  def encode(kind: String, txnId: String, xxid: Long, eventId: Long, tsMs: Long,
             table: String, rowKey: String, before: Map[String, String],
             after: Map[String, String]): String = {
    def m(x: Map[String, String]) =
      x.map { case (k, v) => enc(k) + "=" + enc(v) }.mkString("&")
    Seq(kind, txnId, xxid.toString, eventId.toString, tsMs.toString, table, rowKey,
      m(before), m(after)).mkString("\t")
  }

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String) = URLDecoder.decode(s, "UTF-8")

  def decode(line: String): InternalRow = {
    val f = line.split("\t", -1)
    def mapData(s: String) = {
      val pairs = if (s.isEmpty) Array.empty[(String, String)]
        else s.split("&").map { kv =>
          val Array(k, v) = kv.split("=", 2); (dec(k), dec(v))
        }
      ArrayBasedMapData(pairs.map(p => UTF8String.fromString(p._1)),
        pairs.map(p => UTF8String.fromString(p._2)))
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      UTF8String.fromString(f(0)), UTF8String.fromString(f(1)), f(2).toLong,
      f(3).toLong, f(4).toLong, UTF8String.fromString(f(5)),
      UTF8String.fromString(f(6)), mapData(f(7)), mapData(f(8))))
  }
}
