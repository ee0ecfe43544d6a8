package graft.model

/** The raw binlog event layer — the long tail of event types the reference's
  * supplier models (reference: RawEventType.java:4-43, one enum constant per
  * MySQL binlog event code, a typed payload class for the dozen the
  * augmenter dispatches on, `ByteArrayRawEventData` for the rest).
  *
  * Spark-first shape: ONE flat, nullable, `Encoders.product`-friendly record
  * instead of a class-per-type hierarchy — a `Dataset[RawEvent]` has a
  * single schema, so the whole normalization pipeline stays in columnar form
  * and whole-stage codegen; a sealed ADT would force kryo encoders and
  * row-at-a-time dispatch. Payload fields are `Option`/empty unless the
  * event's type carries them.
  */
object RawEventType {
  // codes per the MySQL binlog spec (reference: RawEventType.java:4-43)
  val UNKNOWN = 0; val START_V3 = 1; val QUERY = 2; val STOP = 3
  val ROTATE = 4; val INTVAR = 5; val LOAD = 6; val SLAVE = 7
  val CREATE_FILE = 8; val APPEND_BLOCK = 9; val EXEC_LOAD = 10
  val DELETE_FILE = 11; val NEW_LOAD = 12; val RAND = 13; val USER_VAR = 14
  val FORMAT_DESCRIPTION = 15; val XID = 16; val BEGIN_LOAD_QUERY = 17
  val EXECUTE_LOAD_QUERY = 18; val TABLE_MAP = 19
  val PRE_GA_WRITE_ROWS = 20; val PRE_GA_UPDATE_ROWS = 21; val PRE_GA_DELETE_ROWS = 22
  val WRITE_ROWS = 23; val UPDATE_ROWS = 24; val DELETE_ROWS = 25
  val INCIDENT = 26; val HEARTBEAT = 27; val IGNORABLE = 28; val ROWS_QUERY = 29
  val EXT_WRITE_ROWS = 30; val EXT_UPDATE_ROWS = 31; val EXT_DELETE_ROWS = 32
  val GTID = 33; val ANONYMOUS_GTID = 34; val PREVIOUS_GTIDS = 35
  val TRANSACTION_CONTEXT = 36; val VIEW_CHANGE = 37; val XA_PREPARE = 38

  /** code → name for every type the reference enumerates. */
  val names: Map[Int, String] = Map(
    UNKNOWN -> "UNKNOWN", START_V3 -> "START_V3", QUERY -> "QUERY",
    STOP -> "STOP", ROTATE -> "ROTATE", INTVAR -> "INTVAR", LOAD -> "LOAD",
    SLAVE -> "SLAVE", CREATE_FILE -> "CREATE_FILE",
    APPEND_BLOCK -> "APPEND_BLOCK", EXEC_LOAD -> "EXEC_LOAD",
    DELETE_FILE -> "DELETE_FILE", NEW_LOAD -> "NEW_LOAD", RAND -> "RAND",
    USER_VAR -> "USER_VAR", FORMAT_DESCRIPTION -> "FORMAT_DESCRIPTION",
    XID -> "XID", BEGIN_LOAD_QUERY -> "BEGIN_LOAD_QUERY",
    EXECUTE_LOAD_QUERY -> "EXECUTE_LOAD_QUERY", TABLE_MAP -> "TABLE_MAP",
    PRE_GA_WRITE_ROWS -> "PRE_GA_WRITE_ROWS",
    PRE_GA_UPDATE_ROWS -> "PRE_GA_UPDATE_ROWS",
    PRE_GA_DELETE_ROWS -> "PRE_GA_DELETE_ROWS",
    WRITE_ROWS -> "WRITE_ROWS", UPDATE_ROWS -> "UPDATE_ROWS",
    DELETE_ROWS -> "DELETE_ROWS", INCIDENT -> "INCIDENT",
    HEARTBEAT -> "HEARTBEAT", IGNORABLE -> "IGNORABLE",
    ROWS_QUERY -> "ROWS_QUERY", EXT_WRITE_ROWS -> "EXT_WRITE_ROWS",
    EXT_UPDATE_ROWS -> "EXT_UPDATE_ROWS", EXT_DELETE_ROWS -> "EXT_DELETE_ROWS",
    GTID -> "GTID", ANONYMOUS_GTID -> "ANONYMOUS_GTID",
    PREVIOUS_GTIDS -> "PREVIOUS_GTIDS",
    TRANSACTION_CONTEXT -> "TRANSACTION_CONTEXT",
    VIEW_CHANGE -> "VIEW_CHANGE", XA_PREPARE -> "XA_PREPARE")

  def nameOf(code: Int): String = names.getOrElse(code, "UNKNOWN")

  /** Codes that carry row images (all three generations of rows events). */
  val writeRowCodes: Set[Int] = Set(PRE_GA_WRITE_ROWS, WRITE_ROWS, EXT_WRITE_ROWS)
  val updateRowCodes: Set[Int] = Set(PRE_GA_UPDATE_ROWS, UPDATE_ROWS, EXT_UPDATE_ROWS)
  val deleteRowCodes: Set[Int] = Set(PRE_GA_DELETE_ROWS, DELETE_ROWS, EXT_DELETE_ROWS)
  val rowCodes: Set[Int] = writeRowCodes ++ updateRowCodes ++ deleteRowCodes

  /** Control/bookkeeping events the normalizer surfaces but never turns into
    * data ops (reference handles these in the supplier loop, not the
    * augmenter). */
  val controlCodes: Set[Int] = Set(START_V3, STOP, ROTATE, INTVAR, RAND,
    USER_VAR, FORMAT_DESCRIPTION, INCIDENT, HEARTBEAT, IGNORABLE,
    PREVIOUS_GTIDS, TRANSACTION_CONTEXT, VIEW_CHANGE, ANONYMOUS_GTID)
}

/** One row image inside a rows event: before/after as schema-agnostic string
  * maps (write: before empty; delete: after empty; update: both). */
final case class RowImage(before: Map[String, String], after: Map[String, String])

/** One raw binlog event. Typed payloads per code:
  *  - QUERY / ROWS_QUERY → `sql` (QueryRawEventData, RowsQueryRawEventData)
  *  - XID → `xid` (XIDRawEventData)
  *  - GTID → `gtid` as "uuid:txnId" (GTIDRawEventData)
  *  - PREVIOUS_GTIDS → `gtidSet` (PreviousGTIDSetRawEventData)
  *  - TABLE_MAP → `tableId`, `db`, `table`, `pkColumns` (TableMapRawEventData)
  *  - *_ROWS → `tableId`, `rows` (Write/Update/DeleteRowsRawEventData)
  *  - ROTATE → `nextFile` (RotateRawEventData)
  *  - INTVAR → `intVar` (IntVarRawEventData)
  *  - XA_PREPARE → `xaId` (XAPrepareRawEventData)
  * Everything else (the reference's plain-`RawEventData` constants) carries
  * only the header, matching its byte-array fallback.
  */
final case class RawEvent(
    code: Int,
    serverId: Long,
    file: String,
    position: Long,
    tsMs: Long,
    sql: Option[String] = None,
    xid: Option[Long] = None,
    gtid: Option[String] = None,
    gtidSet: Option[String] = None,
    tableId: Option[Long] = None,
    db: Option[String] = None,
    table: Option[String] = None,
    pkColumns: Seq[String] = Nil,
    rows: Seq[RowImage] = Nil,
    nextFile: Option[String] = None,
    intVar: Option[Long] = None,
    xaId: Option[String] = None
)
