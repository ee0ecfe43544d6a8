package graft.model

/** Core data model for the graft CDC engine.
  *
  * Mirrors the semantics of the reference's event/checkpoint model
  * (reference: mysql-replicator-commons/.../checkpoint/Checkpoint.java:81-120,
  * mysql-replicator-augmenter-model/.../AugmentedRow.java:11-31) re-expressed
  * as plain Scala case classes that Spark encodes with `Encoders.product`.
  */

/** A global transaction id: server UUID + monotonically increasing txn number.
  * (reference: supplier/mysql/binlog/gtid — GTID string form "uuid:txnId") */
final case class Gtid(uuid: String, txnId: Long) {
  def render: String = s"$uuid:$txnId"
}

/** A stream position: binlog file+pos, optional GTID and accumulated GTID set.
  * Total order follows the reference semantics (Checkpoint.java:81-120):
  * compare by GTID (uuid, then txnId) when both have one; otherwise by
  * timestamp; for the same server, by binlog file then position.
  */
final case class Checkpoint(
    serverId: Long,
    file: String,
    position: Long,
    gtid: Option[Gtid],
    gtidSet: Option[String],
    timestamp: Long
)

object Checkpoint {
  implicit val ordering: Ordering[Checkpoint] = new Ordering[Checkpoint] {
    override def compare(a: Checkpoint, b: Checkpoint): Int = (a.gtid, b.gtid) match {
      case (Some(ga), Some(gb)) =>
        val c = ga.uuid.compareTo(gb.uuid)
        if (c != 0) c else java.lang.Long.compare(ga.txnId, gb.txnId)
      case _ =>
        if (a.serverId == b.serverId) {
          val c = a.file.compareTo(b.file)
          if (c != 0) c else java.lang.Long.compare(a.position, b.position)
        } else java.lang.Long.compare(a.timestamp, b.timestamp)
    }
  }
}

/** Transaction metadata stamped on every row of a committed transaction.
  * (reference: AugmentedEventTransaction.java:17-24 — commitTimestamp,
  * identifier/uuid, xxid, per-second sequence number) */
final case class TxnInfo(uuid: String, xxid: Long, commitTsMs: Long, seq: Int) {
  /** Row microsecond timestamp = commitTs(ms)*1000 + seq*100
    * (reference: AugmentedRow.java:113-116). */
  def microTimestamp: Long = commitTsMs * 1000L + seq.toLong * 100L
}

/** Change-event types the engine understands
  * (reference: AugmentedEventType.java). */
object EventType {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"
  val Query  = "QUERY"
  val All: Seq[String] = Seq(Insert, Update, Delete, Query)
}

/** The normalized change event our sources emit — schema-agnostic row images
  * as string maps, matching the reference's CaseInsensitiveMap values with
  * {"b": before, "a": after} update nesting collapsed into two maps
  * (reference: EventDeserializer.java:15-58, AugmentedRow.java:11-31).
  */
final case class ChangeEvent(
    eventType: String,
    db: String,
    table: String,
    timestampMs: Long,
    checkpoint: Checkpoint,
    txn: Option[TxnInfo],
    pkColumns: Seq[String],
    before: Option[Map[String, String]],
    after: Option[Map[String, String]],
    schemaVersion: Int,
    ddl: Option[String]
) {
  /** Project onto the pipeline's op model: the checkpoint position becomes
    * the total-order event id (binlog file+pos is the order), GTID txn id
    * becomes the transaction key. */
  def toOp: graft.streaming.Op = graft.streaming.Op(
    kind = if (ddl.isDefined) "DDL" else eventType,
    txnId = txn.map(_.uuid).orElse(checkpoint.gtid.map(_.render)).getOrElse(s"pos:${checkpoint.position}"),
    xxid = txn.map(_.xxid).getOrElse(0L),
    eventId = checkpoint.position,
    tsMs = timestampMs,
    table = table,
    rowKey = pkColumns.flatMap(c => after.orElse(before).flatMap(_.get(c))).mkString(";"),
    before = before.getOrElse(Map.empty),
    after = ddl.map(d => Map("ddl" -> d)).getOrElse(after.getOrElse(Map.empty))
  )
}

/** One column of a versioned table schema
  * (reference: ColumnSchema.java:13-35). */
final case class ColumnSpec(
    name: String,
    mysqlType: String,     // e.g. "int(11) unsigned", "enum('a','b')"
    nullable: Boolean,
    key: String,           // "PRI" marks primary-key membership
    defaultValue: Option[String],
    collation: Option[String]
) {
  /** reference: ColumnSchema.java:148-150 */
  def isPrimary: Boolean = key.equalsIgnoreCase("PRI")
}

/** A UNIQUE index: declared name (MySQL defaults to the first column's
  * name) and member columns in index order. */
final case class UniqueKey(name: String, columns: Seq[String])

/** A schema version valid from a given stream position onward
  * (reference: SchemaAtPositionCache / SchemaTransitionSequence.java:16-49). */
final case class TableSchemaV(
    db: String,
    table: String,
    version: Int,
    columns: Seq[ColumnSpec],
    createStatement: Option[String],
    validFromMs: Long,
    uniqueKeys: Seq[UniqueKey] = Nil
) {
  /** Row-identity columns, with MySQL's INDEX-DRIVEN PRI PROMOTION: when a
    * table has no explicit PRIMARY KEY, INFORMATION_SCHEMA reports the
    * FIRST unique index whose columns are all NOT NULL as COLUMN_KEY='PRI'
    * (the implicit cluster key the reference's row-key mapper would read).
    * Promotion is DERIVED here, never written into [[ColumnSpec.key]], so
    * a later ADD PRIMARY KEY cleanly wins and a DROP PRIMARY KEY falls
    * back to the promoted index — exactly the I_S view at each version. */
  def primaryKeyColumns: Seq[String] = {
    val explicit = columns.filter(_.isPrimary).map(_.name)
    if (explicit.nonEmpty) explicit
    else uniqueKeys.collectFirst {
      case uk if uk.columns.nonEmpty && uk.columns.forall(c =>
        columns.exists(x => x.name.equalsIgnoreCase(c) && !x.nullable)) =>
        uk.columns.map(c => columns.find(_.name.equalsIgnoreCase(c)).get.name)
    }.getOrElse(Nil)
  }
}
