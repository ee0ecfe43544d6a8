package graft.sink

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import java.io.ByteArrayOutputStream

import graft.model.TableSchemaV

/** Avro presentation of change rows for the Kafka path, reproducing the
  * reference's Avro type mapping and meta fields (reference:
  * EventDataPresenterAvro.createAvroSchema, EventDataPresenterAvro.java:
  * 152-223; meta fields :135-141,265-269): tinyint/smallint/mediumint/int →
  * int (unsigned int → long), bigint → long (unsigned → string), float/double
  * passthrough, date/time/timestamp/decimal/binary → string, plus
  * `__timestamp`, `__is_deleted`, `__binlog_position`.
  *
  * Built on the plain avro jar (no spark-avro module in this build); used
  * row-at-a-time inside foreachPartition where a broker producer would sit.
  */
object AvroPresenter {

  def avroSchema(table: TableSchemaV): Schema = {
    var fields = SchemaBuilder.record(table.table).namespace(table.db).fields()
    table.columns.foreach { c =>
      val b = fields.name(c.name).`type`()
      val t = c.mysqlType.toLowerCase
      val unsigned = t.contains("unsigned")
      fields =
        if (t.startsWith("tinyint") || t.startsWith("smallint") || t.startsWith("mediumint"))
          b.unionOf().nullType().and().intType().endUnion().nullDefault()
        else if (t.startsWith("int") || t.startsWith("integer"))
          (if (unsigned) b.unionOf().nullType().and().longType().endUnion().nullDefault()
           else b.unionOf().nullType().and().intType().endUnion().nullDefault())
        else if (t.startsWith("bigint"))
          (if (unsigned) b.unionOf().nullType().and().stringType().endUnion().nullDefault()
           else b.unionOf().nullType().and().longType().endUnion().nullDefault())
        else if (t.startsWith("float")) b.unionOf().nullType().and().floatType().endUnion().nullDefault()
        else if (t.startsWith("double")) b.unionOf().nullType().and().doubleType().endUnion().nullDefault()
        else b.unionOf().nullType().and().stringType().endUnion().nullDefault()
    }
    Schema.createRecord(table.table + "_envelope", null, table.db, false,
      java.util.Arrays.asList(
        new Schema.Field("row", fields.endRecord(), null, null),
        new Schema.Field("__timestamp", Schema.create(Schema.Type.LONG), null, null),
        new Schema.Field("__is_deleted", Schema.create(Schema.Type.INT), null, 0),
        new Schema.Field("__binlog_position", Schema.create(Schema.Type.LONG), null, null)))
  }

  /** Registry subject name (reference: AugmentedEventHeader.java:63-69 —
    * `bigdata-{db}-{table}-value`). */
  def subject(db: String, table: String): String = s"bigdata-$db-$table-value"

  def encode(schema: Schema, table: TableSchemaV, values: Map[String, String],
             timestampMs: Long, isDeleted: Boolean, binlogPosition: Long): Array[Byte] = {
    val rowSchema = schema.getField("row").schema()
    val row = new GenericData.Record(rowSchema)
    table.columns.foreach { c =>
      val v = values.get(c.name).orNull
      val t = c.mysqlType.toLowerCase
      val typed: AnyRef =
        if (v == null) null
        else if (t.startsWith("tinyint") || t.startsWith("smallint") || t.startsWith("mediumint"))
          Int.box(v.toInt)
        else if ((t.startsWith("int") || t.startsWith("integer")) && t.contains("unsigned")) Long.box(v.toLong)
        else if (t.startsWith("int") || t.startsWith("integer")) Int.box(v.toInt)
        else if (t.startsWith("bigint") && !t.contains("unsigned")) Long.box(v.toLong)
        else if (t.startsWith("float")) Float.box(v.toFloat)
        else if (t.startsWith("double")) Double.box(v.toDouble)
        else v
      row.put(c.name, typed)
    }
    val rec = new GenericData.Record(schema)
    rec.put("row", row)
    rec.put("__timestamp", Long.box(timestampMs))
    rec.put("__is_deleted", Int.box(if (isDeleted) 1 else 0))
    rec.put("__binlog_position", Long.box(binlogPosition))
    serialize(schema, rec)
  }

  /** DDL schema-compatibility gate (reference:
    * KafkaApplier.handleIncompatibleSchemaChange, KafkaApplier.java:261-287):
    * a new table schema must be able to READ data written with the previous
    * one; if not, the subject needs forced re-registration. Uses Avro's own
    * compatibility checker. */
  def isBackwardCompatible(newSchema: Schema, oldSchema: Schema): Boolean =
    org.apache.avro.SchemaCompatibility.checkReaderWriterCompatibility(newSchema, oldSchema)
      .getType == org.apache.avro.SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE

  private def serialize(schema: Schema, rec: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
