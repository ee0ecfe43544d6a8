package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.augment.SchemaCatalog
import graft.sink.{AvroPresenter, FileSchemaRegistry}

/** Initial-sync bootstrap — the engine's analog of the reference's
  * BootstrapReplicator (reference: BootstrapReplicator.java:38-104: recreate
  * every source table's schema in the active-schema DB and register its Avro
  * subject before the stream starts). The interface is JDBC-shaped — a table
  * loader function — so a live deployment passes
  * `name => spark.read.jdbc(url, name, props)` while the sandbox (and tests)
  * pass parquet readers; the scrape itself only touches schemas.
  *
  * The data backfill that follows the scrape is [[ReplicatorPipeline.runBatch]]
  * (the binlog-flusher analog, SURVEY §2.1 S4) — bootstrap populates the
  * catalog those batches decode against.
  */
object Bootstrap {

  /** Spark type → MySQL column-type string, the inverse direction of the
    * §1.3 decode table (used only to seed the catalog with faithful specs). */
  def mysqlTypeOf(dt: DataType): String = dt match {
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "tinyint(1)"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case TimestampType | TimestampNTZType => "datetime"
    case DateType => "date"
    case BinaryType => "blob"
    case _ => "varchar(255)"
  }

  /** Scrape `tables` into the catalog (one synthetic CREATE TABLE per table,
    * so the catalog's DDL history shows the bootstrap like any other
    * transition) and register each table's Avro subject. Returns the
    * registered subject → version map. */
  def scrape(catalog: SchemaCatalog, registry: FileSchemaRegistry, db: String,
             tables: Map[String, DataFrame], primaryKeys: Map[String, Seq[String]],
             tsMs: Long = 0L): Map[String, Int] = {
    tables.map { case (name, df) =>
      val cols = df.schema.fields.map { f =>
        s"`${f.name}` ${mysqlTypeOf(f.dataType)}${if (!f.nullable) " NOT NULL" else ""}"
      }
      val pk = primaryKeys.get(name).filter(_.nonEmpty)
        .map(p => s", PRIMARY KEY (${p.mkString(",")})").getOrElse("")
      catalog.applyDdl(s"CREATE TABLE `$name` (${cols.mkString(", ")}$pk)", tsMs)
      val schema = catalog.current(name).getOrElse(
        throw new IllegalStateException(s"bootstrap failed to install schema for $name"))
      val subject = AvroPresenter.subject(db, name)
      subject -> registry.register(subject, AvroPresenter.avroSchema(schema))
    }
  }
}
