package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sink.AvroPresenter
import graft.model.{ColumnSpec, TableSchemaV}

/** Multimodal binary plumbing + Avro presentation specs. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media meta sniffs magic bytes into typed metadata") {
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 1, 2)
    val png = "PNG1234".getBytes("ISO-8859-1")
    val df = Seq((1L, jpeg), (2L, png), (3L, "plain text".getBytes)).toDF("id", "payload")
    val rows = Multimodal.withMediaMeta(df, col("payload"))
      .select(col("id"), col("media_meta.media_type")).as[(Long, String)].collect().toMap
    assert(rows(1L) == "image/jpeg")
    assert(rows(2L) == "image/png")
    assert(rows(3L) == "application/octet-stream")
  }

  test("ppm codec parses real P6 headers: comments, whitespace, garbage, truncation") {
    import Multimodal.PpmCodec
    // 2x1 raster: pixels (1,2,3) (250,251,252); comment + extra whitespace
    val good = ("P6\n# a comment\n 2  1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 250.toByte, 251.toByte, 252.toByte)
    val p = PpmCodec.decode(good).get
    assert((p.width, p.height, p.maxval) == ((2, 1, 255)))
    assert((p.sumR, p.sumG, p.sumB) == ((251L, 253L, 255L)))
    // undecodable inputs -> None, never a throw
    assert(PpmCodec.decode(null).isEmpty)
    assert(PpmCodec.decode("P5\n2 1\n255\n??????".getBytes).isEmpty) // wrong magic
    assert(PpmCodec.decode("P6\n2 1\n255\n??".getBytes).isEmpty)     // truncated raster
    assert(PpmCodec.decode("P6\n2 1\n9999999999\n".getBytes).isEmpty) // maxval overflow digits
    // distributed decode: struct row per payload, null for the bad one
    val df = Seq((1L, good), (2L, "nonsense".getBytes)).toDF("id", "payload")
    val out = Multimodal.decodePpm(df, "payload")
      .select(col("id"), col("ppm.sum_r"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(251L) && out(2L).isEmpty)
  }

  test("wav codec walks real RIFF chunk lists: extra chunks, padding, truncation") {
    import Multimodal.WavCodec
    val data = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val wav = Multimodal.buildWav(channels = 2, sampleRate = 8000, bitsPerSample = 16, data)
    val w = WavCodec.decode(wav).get
    assert((w.audioFormat, w.channels, w.sampleRate, w.bitsPerSample) == ((1, 2, 8000, 16)))
    assert(w.dataLen == 8L && w.byteRate == 32000L && w.durationMs == 0L)
    // an ODD-sized unknown chunk before fmt must be skipped with padding
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9) ++ Array[Byte](0) // 3 bytes + pad
    val withExtra = wav.take(12) ++ extra ++ wav.drop(12)
    // patch the RIFF size: + extra chunk bytes
    val bb = java.nio.ByteBuffer.wrap(withExtra).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withExtra.length - 8)
    assert(WavCodec.decode(withExtra).contains(w))
    // undecodable inputs -> None, never a throw
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)           // no chunks
    assert(WavCodec.decode(wav.take(30)).isEmpty)                      // truncated fmt
    assert(WavCodec.decode("FORM".getBytes ++ wav.drop(4)).isEmpty)    // wrong magic
    // data declared longer than present clips to the actual payload
    val lying = wav.clone()
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(40, 999)
    assert(WavCodec.decode(lying).get.dataLen == 8L)
    // a chunk size with the u32 high bit set (negative as Int) must TERMINATE
    // with None, not stall the chunk walk forever (executor-task hang)
    val hostile = "RIFF".getBytes("US-ASCII") ++ Array[Byte](36, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      new Array[Byte](32)
    assert(WavCodec.decode(hostile).isEmpty)
  }

  test("extractFeatures runs the stub codec per partition with stable schema") {
    val df = Seq((1L, "aaaa".getBytes), (2L, "bbbbbbbb".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.extractFeatures(df, "payload")
    assert(out.schema.fieldNames.contains("frame"))
    val rows = out.select(col("doc_id"), col("frame.width")).as[(Long, Int)].collect().toMap
    assert(rows.size == 2 && rows.values.forall(_ >= 16))
    // deterministic in the payload
    val again = Multimodal.extractFeatures(df, "payload")
      .select(col("doc_id"), col("frame.width")).as[(Long, Int)].collect().toMap
    assert(again == rows)
  }

  test("resize fits the box, scales payload by area ratio, stays deterministic") {
    val payload = Array.tabulate(10000)(i => (i % 251).toByte)
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val out = Multimodal.resizePayloads(df, "payload", 64, 64)
      .select(col("resized_meta.width"), col("resized_meta.height"),
        octet_length(col("resized")), col("resized"))
      .as[(Int, Int, Int, Array[Byte])].collect()(0)
    val (w, h, _) = Multimodal.FakeCodec.decodeDims(payload)
    assert(out._1 <= 64 && out._2 <= 64)
    // aspect preserved to integer truncation
    assert(math.abs(out._1.toDouble / out._2 - w.toDouble / h) < 0.1)
    // payload length proportional to area ratio
    val expected = payload.length.toLong * (out._1.toLong * out._2) / (w.toLong * h)
    assert(math.abs(out._3 - expected) <= 1)
    val again = Multimodal.resizePayloads(df, "payload", 64, 64)
      .select(col("resized")).as[Array[Byte]].collect()(0)
    assert(java.util.Arrays.equals(again, out._4))
    // a payload already inside the box is untouched dimensionally
    val small = Multimodal.resizePayloads(df, "payload", 4096, 4096)
      .select(col("resized_meta.width"), col("resized_meta.height"))
      .as[(Int, Int)].collect()(0)
    assert(small == ((w, h)))
    // empty and NULL payloads carry through instead of crashing the task
    val degenerate = Multimodal.resizePayloads(
        Seq((2L, Array.empty[Byte]), (3L, null)).toDF("doc_id", "payload"),
        "payload", 64, 64)
      .select(col("doc_id"), octet_length(col("resized")), col("resized_meta").isNull)
      .as[(Long, Option[Int], Boolean)].collect().toSet
    assert(degenerate == Set((2L, Some(0), true), (3L, None, true)))
    val nullFrame = Multimodal.extractFeatures(
        Seq((3L, null: Array[Byte])).toDF("doc_id", "payload"), "payload")
      .select(col("frame").isNull).as[Boolean].collect()(0)
    assert(nullFrame)
  }

  test("frame sampling indices") {
    val idx = Seq(10).toDF("n")
      .select(Multimodal.sampleFrameIndices(col("n"), 3)).as[Seq[Int]].collect()(0)
    assert(idx == Seq(0, 3, 6, 9))
  }

  test("avro presenter reproduces the reference type mapping + meta fields") {
    val table = TableSchemaV("db", "organisms", 0, Seq(
      ColumnSpec("id", "int(11)", nullable = false, "PRI", None, None),
      ColumnSpec("lifespan", "tinyint(3) unsigned", nullable = true, "", None, None),
      ColumnSpec("big_u", "bigint(20) unsigned", nullable = true, "", None, None),
      ColumnSpec("name", "varchar(30)", nullable = true, "", None, None)), None, 0L)
    val schema = AvroPresenter.avroSchema(table)
    val row = schema.getField("row").schema()
    assert(row.getField("id").schema().getTypes.get(1).getType.getName == "int")
    assert(row.getField("lifespan").schema().getTypes.get(1).getType.getName == "int")
    assert(row.getField("big_u").schema().getTypes.get(1).getType.getName == "string")
    assert(schema.getField("__timestamp") != null && schema.getField("__is_deleted") != null
      && schema.getField("__binlog_position") != null)
    assert(AvroPresenter.subject("db", "organisms") == "bigdata-db-organisms-value")
    val bytes = AvroPresenter.encode(schema, table,
      Map("id" -> "2", "lifespan" -> "240", "big_u" -> "18446744071615", "name" -> "Ñandú"),
      timestampMs = 123L, isDeleted = false, binlogPosition = 456L)
    assert(bytes.nonEmpty)
  }
}
