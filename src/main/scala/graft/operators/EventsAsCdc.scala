package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.Op

/** Adapter: view the driver's `events` table as a CDC op stream, so the full
  * transaction-assembly → time-machine path runs (and is oracle-checked)
  * against real data. Each user_id becomes one transaction over one row:
  * the first event is its INSERT, later events are UPDATEs carrying
  * before-images from `lag`, and a synthesized COMMIT closes the txn at the
  * user's max timestamp.
  */
object EventsAsCdc {

  /** Values rendered through decimal(10,2) so the string form is
    * engine-portable (double→string shortest-repr is not contractual). */
  private def valueStr(c: org.apache.spark.sql.Column) =
    c.cast("decimal(10,2)").cast("string")

  def opsFromEvents(spark: SparkSession, events: DataFrame): Dataset[Op] = {
    import spark.implicits._
    // ONE scan, ONE shuffle: the ordered window (row_number/lag) and the
    // full-partition aggregates (max event_id / max ts, replacing a separate
    // groupBy scan + union) share the user_id Exchange; the synthesized
    // COMMIT op emits by exploding a 2-element array on each user's last
    // event. A union-of-scans formulation executes the source twice.
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    def common = Seq(
      col("user_id").cast("string").as("txnId"),
      col("user_id").as("xxid"),
      lit("events").as("table"),
      col("user_id").cast("string").as("rowKey"))
    val opStruct = struct(
      Seq(when(col("rn") === 1, "INSERT").otherwise("UPDATE").as("kind"),
        col("event_id").as("eventId"),
        unix_millis(col("ts")).as("tsMs"),
        when(col("rn") === 1, lit(null).cast("map<string,string>"))
          .otherwise(map(lit("value"), valueStr(col("pv")), lit("event_type"), col("pt"))).as("before"),
        map(lit("value"), valueStr(col("value")), lit("event_type"), col("event_type")).as("after"))
        ++ common: _*)
    val commitStruct = struct(
      Seq(lit("COMMIT").as("kind"),
        (col("maxEv") + 1000000L).as("eventId"),
        col("commitMs").as("tsMs"),
        lit(null).cast("map<string,string>").as("before"),
        lit(null).cast("map<string,string>").as("after"))
        ++ common: _*)
    events
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pv", lag(col("value"), 1).over(wOrd))
      .withColumn("pt", lag(col("event_type"), 1).over(wOrd))
      .withColumn("maxEv", max(col("event_id")).over(wAll))
      .withColumn("commitMs", max(unix_millis(col("ts"))).over(wAll))
      .select(explode(
        when(col("event_id") === col("maxEv"), array(opStruct, commitStruct))
          .otherwise(array(opStruct))).as("op"))
      .select("op.kind", "op.txnId", "op.xxid", "op.eventId", "op.tsMs",
        "op.table", "op.rowKey", "op.before", "op.after")
      .as[Op]
  }

  /** View the `events` table as a RAW binlog stream — one serialized
    * transaction block per user (GTID, TABLE_MAP, WRITE_ROWS for the first
    * event, UPDATE_ROWS for later ones, XID at the user's max timestamp) at
    * strictly increasing per-block positions, matching the binlog contract
    * that committed transactions appear serialized. Exercises the full
    * supplier-edge path: [[RawBinlogAdapter.toOps]] must re-derive exactly
    * the op stream [[opsFromEvents]] builds directly.
    */
  def rawFromEvents(spark: SparkSession, events: DataFrame): Dataset[graft.model.RawEvent] = {
    import spark.implicits._
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    val RT = graft.model.RawEventType
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    val noPk = lit(null).cast("array<string>")
    val rowsT = "array<struct<before:map<string,string>,after:map<string,string>>>"
    val noRows = lit(null).cast(rowsT)
    def raw(code: Column, position: Column, tsMs: Column,
            sql: Column = nullS, xid: Column = nullL, gtid: Column = nullS,
            tableId: Column = nullL, db: Column = nullS, table: Column = nullS,
            pkColumns: Column = noPk, rows: Column = noRows): Column =
      struct(code.as("code"), lit(1L).as("serverId"),
        lit("binlog.000001").as("file"), position.as("position"),
        tsMs.as("tsMs"), sql.as("sql"), xid.as("xid"), gtid.as("gtid"),
        nullS.as("gtidSet"), tableId.as("tableId"), db.as("db"),
        table.as("table"), pkColumns.as("pkColumns"), rows.as("rows"),
        nullS.as("nextFile"), nullL.as("intVar"), nullS.as("xaId"))
    val base = col("user_id").cast("long") * 10000000L
    val tsMs = unix_millis(col("ts"))
    val after = map(
      lit("user_id"), col("user_id").cast("string"),
      lit("event_id"), col("event_id").cast("string"),
      lit("value"), valueStr(col("value")),
      lit("event_type"), col("event_type"))
    val before = when(col("rn") === 1, lit(null).cast("map<string,string>"))
      .otherwise(map(
        lit("user_id"), col("user_id").cast("string"),
        lit("value"), valueStr(col("pv")),
        lit("event_type"), col("pt")))
    val rowsEv = raw(
      when(col("rn") === 1, RT.WRITE_ROWS).otherwise(RT.UPDATE_ROWS),
      base + 10L + col("rn"), tsMs, tableId = col("user_id").cast("long"),
      rows = array(struct(coalesce(before, typedLit(Map.empty[String, String])).as("before"),
        after.as("after"))))
    val gtidEv = raw(lit(RT.GTID), base + 1L, tsMs,
      gtid = concat(lit("srv1:"), col("user_id").cast("string")))
    val tableMapEv = raw(lit(RT.TABLE_MAP), base + 2L, tsMs,
      tableId = col("user_id").cast("long"), db = lit("shop"),
      table = lit("events"), pkColumns = array(lit("user_id")))
    val xidEv = raw(lit(RT.XID), base + 10L + col("maxRn") + 1L,
      col("commitMs"), xid = col("user_id").cast("long"))
    events
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pv", lag(col("value"), 1).over(wOrd))
      .withColumn("pt", lag(col("event_type"), 1).over(wOrd))
      .withColumn("maxRn", count(lit(1)).over(wAll))
      .withColumn("commitMs", max(unix_millis(col("ts"))).over(wAll))
      .select(explode(filter(array(
        when(col("rn") === 1, gtidEv),
        when(col("rn") === 1, tableMapEv),
        rowsEv,
        when(col("rn") === col("maxRn"), xidEv)), e => e.isNotNull)).as("r"))
      .select("r.*")
      .as[graft.model.RawEvent]
  }
}
