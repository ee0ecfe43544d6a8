package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs. The Spark-side mechanics —
  * schema, batch iteration, partition sizing — are real; the actual codec
  * call is stubbed behind [[FakeCodec]] (decode libraries are not in this
  * container) with a deterministic fake so tests exercise the full path.
  *
  * At 100 TB the key constraints this module encodes:
  *  - payload bytes stay OFF the shuffle: decode/feature-extract runs
  *    `mapPartitions` in place, metadata-only columns shuffle afterwards;
  *  - `spark.sql.files.maxPartitionBytes` governs scan partition sizing, and
  *    binary rows are large, so feature extraction is per-partition batched.
  */
object Multimodal {

  /** Metadata struct carried beside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("magic", StringType, nullable = true),
    StructField("media_type", StringType, nullable = true)
  ))

  /** Decoded-frame feature schema produced by the (stubbed) codec. */
  val frameFeatureType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = false)
  ))

  /** Sniff payload metadata from the raw bytes — pure column expressions:
    * byte length, 4-byte magic prefix (hex), and a magic→type map. */
  def withMediaMeta(df: DataFrame, binCol: Column): DataFrame = {
    val magic = hex(substring(binCol, 1, 4))
    val mediaType = when(magic.startsWith("FFD8"), "image/jpeg")
      .when(magic === "89504E47", "image/png")
      .when(magic === "52494646", "audio/wav")
      .otherwise("application/octet-stream")
    df.withColumn("media_meta",
      struct(octet_length(binCol).cast("long").as("byte_len"),
             magic.as("magic"), mediaType.as("media_type")))
  }

  /** STUB codec: a real build links an image/audio library here. The fake is
    * deterministic in the payload bytes so the distributed plumbing (batch
    * shape, schema, partition boundaries) is fully testable. */
  object FakeCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 16 + math.floorMod(h, 640)
      val ht = 16 + math.floorMod(h / 640, 480)
      val frames = 1 + math.floorMod(h / 307200, 16)
      (w, ht, frames)
    }
    /** Fake per-frame feature: 8-dim moments of the byte histogram. */
    def feature(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Long](8)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 5) += 1; i += 1 }
      val n = math.max(1, bytes.length).toDouble
      hist.map(_ / n)
    }
  }

  /** REAL codec for binary P6 PPM (Netpbm — public format): magic check,
    * whitespace- and comment-tolerant header parse (dims + maxval), then
    * per-channel byte sums over the RGB raster. This is the proof that the
    * [[extractFeatures]] plumbing runs an actual decoder distributed — a
    * production build links libjpeg/ffmpeg into the same `mapPartitions`
    * slot. Integer sums (not float means) keep the output exactly
    * comparable across engines. Undecodable bytes → None, never a throw. */
  object PpmCodec {
    final case class Ppm(width: Int, height: Int, maxval: Int,
                         sumR: Long, sumG: Long, sumB: Long)

    def decode(bytes: Array[Byte]): Option[Ppm] = {
      if (bytes == null || bytes.length < 9 ||
          bytes(0) != 'P' || bytes(1) != '6') return None
      var pos = 2
      // read the next header int, skipping whitespace and '#' comments
      def nextInt(): Option[Int] = {
        while (pos < bytes.length &&
               (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
          if (bytes(pos) == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else pos += 1
        }
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
        // 9-digit cap: anything longer is garbage and would overflow toInt
        if (pos == start || pos - start > 9) None
        else Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
      }
      for {
        w <- nextInt(); h <- nextInt(); mv <- nextInt()
        if w > 0 && h > 0 && mv > 0 && mv < 65536 && pos < bytes.length
        // exactly ONE whitespace byte separates maxval from the raster
        _ = (pos += 1)
        need = w.toLong * h * 3
        if mv <= 255 && bytes.length - pos >= need // 2-byte samples unsupported
      } yield {
        var (r, g, b) = (0L, 0L, 0L)
        var i = 0
        while (i < need) {
          val v = bytes(pos + i) & 0xFF
          (i % 3: @annotation.switch) match {
            case 0 => r += v
            case 1 => g += v
            case _ => b += v
          }
          i += 1
        }
        Ppm(w, h, mv, r, g, b)
      }
    }
  }

  /** REAL codec for RIFF/WAVE headers (public format): validates the RIFF
    * container, walks the chunk list (chunks may precede `fmt `; odd-sized
    * chunks pad to even per the spec), and reads the PCM format fields +
    * data length. The audio twin of [[PpmCodec]] — proof the audio arm of
    * the multimodal plumbing parses a real container, with the raw sample
    * payload left opaque exactly as a feature pipeline would. */
  object WavCodec {
    final case class Wav(audioFormat: Int, channels: Int, sampleRate: Int,
                         bitsPerSample: Int, dataLen: Long) {
      def byteRate: Long = sampleRate.toLong * channels * bitsPerSample / 8
      def durationMs: Long = if (byteRate <= 0) 0L else dataLen * 1000L / byteRate
    }

    private def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
        ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")

    def decode(bytes: Array[Byte]): Option[Wav] = {
      if (bytes == null || bytes.length < 44 ||
          tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var dataLen: Option[Long] = None
      while (pos + 8 <= bytes.length && (fmt.isEmpty || dataLen.isEmpty)) {
        val id = tag(bytes, pos)
        val size = u32(bytes, pos + 4)
        val body = pos + 8
        id match {
          case "fmt " if size >= 16 && body + 16 <= bytes.length =>
            fmt = Some((u16(bytes, body), u16(bytes, body + 2),
              u32(bytes, body + 4).toInt, u16(bytes, body + 14)))
          case "data" =>
            // honor the declared size, clipped to what is actually present
            dataLen = Some(math.min(size, (bytes.length - body).toLong))
          case _ => ()
        }
        // A declared size larger than the remaining bytes means a truncated
        // (or hostile) chunk — nothing can follow it, and size.toInt may be
        // negative (u32 high bit), which would stall or rewind pos forever.
        if (size > bytes.length - body) pos = bytes.length
        else pos = body + size.toInt + (size.toInt & 1) // odd chunks pad to even
      }
      for ((af, ch, sr, bps) <- fmt; dl <- dataLen
           if ch > 0 && sr > 0 && bps > 0)
        yield Wav(af, ch, sr, bps, dl)
    }
  }

  /** Decode WAV payloads via `mapPartitions`; appends a `wav` struct
    * (null for undecodable payloads). */
  def decodeWav(df: DataFrame, binColName: String): DataFrame = {
    val wavType = StructType(Seq(
      StructField("audio_format", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("bits_per_sample", IntegerType, nullable = false),
      StructField("data_len", LongType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val outSchema = StructType(df.schema.fields :+ StructField("wav", wavType))
    val binIdx = df.schema.fieldIndex(binColName)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = WavCodec.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ decoded.map(w =>
          Row(w.audioFormat, w.channels, w.sampleRate, w.bitsPerSample,
            w.dataLen, w.durationMs)).orNull)
      }
    }(enc)
  }

  /** Deterministic PCM WAV payload builder (JVM-side twin of the decoder,
    * used by the oracle round-trip query): standard 44-byte RIFF header +
    * the given data bytes truncated to whole frames. */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = if (blockAlign <= 0) 0 else (data.length / blockAlign) * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * bitsPerSample / 8)
      .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(data, 0, dataLen)
    buf.array()
  }

  /** Decode P6 payloads via `mapPartitions` — same batch shape as
    * [[extractFeatures]] but with the REAL [[PpmCodec]]; appends a
    * `ppm` struct (null for undecodable payloads). */
  def decodePpm(df: DataFrame, binColName: String): DataFrame = {
    val ppmType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("maxval", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val outSchema = StructType(df.schema.fields :+ StructField("ppm", ppmType))
    val binIdx = df.schema.fieldIndex(binColName)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = PpmCodec.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ decoded.map(p =>
          Row(p.width, p.height, p.maxval, p.sumR, p.sumG, p.sumB)).orNull)
      }
    }(enc)
  }

  /** Decode + feature-extract over the binary column via `mapPartitions` —
    * the Scala analog of a pandas_udf/mapInPandas batch: one codec context
    * per partition, rows streamed through it, payload never shuffled. */
  def extractFeatures(df: DataFrame, binColName: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("frame", frameFeatureType))
    val binIdx = df.schema.fieldIndex(binColName)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec init would happen here (the expensive part)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Row.fromSeq(r.toSeq :+ null) // undecodable → null frame
        else {
          val (w, h, f) = FakeCodec.decodeDims(bytes)
          Row.fromSeq(r.toSeq :+ Row(w, h, f, FakeCodec.feature(bytes)))
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling: keep every `stride`-th frame index up to
    * `n_frames` — pure column math over the decoded metadata. */
  def sampleFrameIndices(nFrames: Column, stride: Int): Column =
    sequence(lit(0), nFrames - 1, lit(stride))

  /** Resize (downscale) payloads to a target box — `mapPartitions` like
    * [[extractFeatures]]: one codec context per partition, the original
    * payload read and the resized payload written in place, neither ever
    * shuffled. The stub "resampler" is deterministic in (bytes, target):
    * output dims are the aspect-preserving fit and the output payload is a
    * proportional byte resample, so the size contract (dims fit the box,
    * len ∝ area ratio) is testable without a real image library — swap
    * [[FakeCodec]] for one to go live. */
  def resizePayloads(df: DataFrame, binColName: String,
                     maxW: Int, maxH: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_meta", StructType(Seq(
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false))))))
    val binIdx = df.schema.fieldIndex(binColName)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty) {
          // null/empty payloads carry through untouched — no codec call, no
          // fabricated dims (null meta marks "nothing to resize")
          Row.fromSeq(r.toSeq ++ Seq(bytes, null))
        } else {
          val (w, h, _) = FakeCodec.decodeDims(bytes)
          val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
          val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val outLen = math.max(1,
            (bytes.length * (ow.toLong * oh) / math.max(1L, w.toLong * h)).toInt)
          val o = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) { o(i) = bytes(((i.toLong * bytes.length) / outLen).toInt); i += 1 }
          Row.fromSeq(r.toSeq ++ Seq(o, Row(ow, oh)))
        }
      }
    }(enc)
  }
}
