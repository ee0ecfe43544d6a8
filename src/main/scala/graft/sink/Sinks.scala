package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's non-HBase appliers re-expressed as Spark sinks
  * (reference: applier/console/ConsoleApplier.java:23-80,
  * applier/count/CountApplier.java:15-46, applier/kafka/KafkaApplier.java). */
object Sinks {

  /** Console applier: JSON-serialize each event (reference: ConsoleApplier).
    * For streams use `writeStream.format("console")`; this is the foreachBatch
    * body form. */
  def console(df: DataFrame, limit: Int = 20): Unit =
    df.select(to_json(struct(col("*"))).as("event")).show(limit, truncate = false)

  /** Count applier: event counts by type (reference: CountApplier). */
  def counts(df: DataFrame, typeCol: String = "kind"): DataFrame =
    df.groupBy(typeCol).agg(count(lit(1)).as("cnt"))

  /** Kafka-applier analog without a broker: an append-only partitioned log
    * directory. Each record becomes (partition, key, value) exactly as the
    * KafkaApplier produces — key is the header JSON, value the event JSON
    * (reference: KafkaApplier.java:209-237 JSON mode) — routed by the same
    * partitioner column the reference uses (Partitioner.TRID/XXID). The
    * `partition` column maps 1:1 onto Kafka topic partitions when a real
    * broker connector replaces the directory. */
  def kafkaLikeJson(df: DataFrame, partitions: Int, partitionKey: String, logDir: String,
                    includeColumns: Option[Seq[String]] = None): Unit =
    kafkaRecords(df, partitions, partitionKey, includeColumns)
      .write.mode("append").partitionBy("partition").parquet(logDir)

  /** The Kafka-applier's record shaping, sink-agnostic: (partition, key,
    * value, eventId) exactly as the reference produces them — key is the
    * header JSON, value the event JSON (KafkaApplier.java:209-237 JSON
    * mode), routed by the reference's partitioner column. Feed the result
    * to [[kafkaLikeJson]] (file-modeled log) or to
    * [[graft.sink.KafkaRecordForeachWriter]] (wire-level producer shim). */
  def kafkaRecords(df: DataFrame, partitions: Int, partitionKey: String,
                   includeColumns: Option[Seq[String]] = None): DataFrame = {
    // column include-filter on the serialized payload (reference:
    // KafkaApplier.setupColumnsFilter, KafkaApplier.java:127-141 — a
    // serialization filter, not a projection: unlisted columns simply
    // don't appear in the message)
    val filtered = includeColumns.fold(df) { cols =>
      val keep = typedLit(cols)
      df.withColumn("after", map_filter(col("after"), (k, _) => array_contains(keep, k)))
        .withColumn("before", map_filter(col("before"), (k, _) => array_contains(keep, k)))
    }
    filtered
      .withColumn("partition", pmod(xxhash64(col(partitionKey)), lit(partitions.toLong)))
      .withColumn("key", to_json(struct(col("txnUuid"), col("table"), col("eventId"))))
      .withColumn("value", to_json(struct(col("*"))))
      .select("partition", "key", "value", "eventId")
  }

  /** Avro mode of the Kafka-applier analog: encode each row's after-image
    * through [[AvroPresenter]] (reference type mapping + __timestamp/
    * __is_deleted/__binlog_position meta fields) inside mapPartitions — one
    * schema parse per partition, payload bytes produced executor-side, never
    * on the driver (reference: KafkaApplier.java:154-207 avro path). */
  def kafkaLikeAvro(df: DataFrame, table: graft.model.TableSchemaV, partitions: Int,
                    partitionKey: String, logDir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val schemaJson = AvroPresenter.avroSchema(table).toString
    val encoded = df.select(col(partitionKey).cast("string").as("pk"), col("kind"),
        col("after"), col("tsMs"), col("eventId"))
      .as[(String, String, Map[String, String], Long, Long)]
      .mapPartitions { it =>
        val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
        it.map { case (pk, kind, after, ts, ev) =>
          (pk, AvroPresenter.encode(schema, table, after, ts, kind == "DELETE", ev), ev)
        }
      }.toDF("pk", "value_avro", "eventId")
    encoded.withColumn("partition", pmod(xxhash64(col("pk")), lit(partitions.toLong)))
      .write.mode("append").partitionBy("partition").parquet(logDir)
  }

  /** Sink-tail watermark seek: read the max applied event id per partition of
    * the log, so replayed input below the watermark can be dropped — the
    * KafkaSeeker analog (reference: applier/kafka/KafkaSeeker.java:64-144
    * reads the last message of every partition and filters below it). */
  def seekWatermarks(spark: SparkSession, logDir: String): Map[Long, Long] =
    try {
      spark.read.parquet(logDir)
        .groupBy("partition").agg(max(col("eventId")).as("hi"))
        .select(col("partition").cast("long"), col("hi").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } catch { case _: Exception => Map.empty }

  /** Drop events at or below their partition's applied watermark. */
  def seekFilter(df: DataFrame, partitions: Int, partitionKey: String,
                 watermarks: Map[Long, Long]): DataFrame =
    if (watermarks.isEmpty) df
    else {
      val wmEntries = watermarks.toSeq.flatMap { case (p, hi) => Seq(lit(p), lit(hi)) }
      val wm = map(wmEntries: _*)
      val part = pmod(xxhash64(col(partitionKey)), lit(partitions.toLong))
      df.filter(element_at(wm, part).isNull || col("eventId") > element_at(wm, part))
    }

  /** Close the validation loop: compare a source-of-truth table against the
    * time-machine latest rows (the external validator's job in the
    * reference); returns mismatching keys with both images. Full outer join
    * on the row key catches missing AND phantom rows. */
  def validateAgainstSource(source: DataFrame, keyCol: String, valueCols: Seq[String],
                            latestRows: DataFrame): DataFrame = {
    val src = source.select(col(keyCol).cast("string").as("row_key"),
      map(valueCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*).as("src_cols"))
    val tgt = latestRows.select(col("row_key"), col("cols").as("tgt_cols"))
    src.join(tgt, Seq("row_key"), "full_outer")
      .filter(valueCols.map(c =>
        !(element_at(col("src_cols"), c) <=> element_at(col("tgt_cols"), c)))
        .reduce(_ || _) || col("src_cols").isNull || col("tgt_cols").isNull)
  }

  /** Validation sampler: emit 1-of-N mutations as source-vs-target compare
    * tasks (reference: applier/validation/ValidationService.java:37-100).
    * Hash-deterministic sampling (not a counter) so it is stable under
    * retries and across executors. */
  def validationSample(df: DataFrame, n: Int, keyCol: String): DataFrame =
    df.filter(pmod(xxhash64(col(keyCol)), lit(n.toLong)) === 0)
      .withColumn("validation_task",
        to_json(struct(col(keyCol).as("key"), current_timestamp().as("emitted_at"))))
}
