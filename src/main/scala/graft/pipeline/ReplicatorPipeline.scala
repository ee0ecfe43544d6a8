package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.{Op, StampedOp, TimeMachineSink, TransactionAssembler}
import graft.sink.Sinks

/** Pipeline assembly: source → transaction assembly → table filter →
  * partition → time-machine sink, with checkpointed exactly-once via the
  * engine's offset log — the Spark-native shape of the reference's
  * Replicator wiring (reference: Replicator.java:151-204; SURVEY §3.1).
  *
  * The reference's three thread boundaries (binlog thread → queues → worker
  * tasks → checkpoint timer) collapse into one StreamingQuery: micro-batch
  * scheduling replaces the queues, `checkpointLocation` replaces the
  * ZooKeeper checkpoint store, and query restart replaces ForceRewind.
  */
final case class PipelineConfig(
    sinkDir: String,
    checkpointDir: String,
    tables: TableFilterConfig = TableFilterConfig(),
    partitioner: String = "TRID",      // reference default (Partitioner.java:98-102)
    partitions: Int = 8,                // reference prod sample: 8 tasks
    txnSizeLimit: Int = 1000,           // reference transaction buffer limit
    validationSampleN: Int = 100,       // reference ValidationService default
    validationDir: Option[String] = None,
    /** Designated per-transaction context-log table: its rows are keyed by
      * transaction UUID instead of the PK row key (reference:
      * HBaseRowKeyMapper.getPayloadTableHBaseRowKey, HBaseRowKeyMapper.java:
      * 60-68; applier.hbase.payload.table.name). */
    payloadTable: Option[String] = None,
    triggerMs: Long = 5000L,            // reference safe-checkpoint period
    schemaCatalog: Option[graft.augment.SchemaCatalog] = None,
    schemaHistoryDir: Option[String] = None,
    /** Kafka-path schema registry root: on every DDL the affected tables'
      * Avro subjects re-register through the compat gate — compatible
      * change → next version, incompatible → delete + re-register from v1
      * (reference: KafkaApplier.handleIncompatibleSchemaChange,
      * KafkaApplier.java:261-287). */
    schemaRegistryDir: Option[String] = None,
    /** Opt-in eviction of transactions with no COMMIT (processing-time state
      * timeout). Off by default: per-txn state is already bounded by the
      * oversize-chunk guard, and timeout triggers interact badly with
      * test-style processAllAvailable draining. */
    abandonedTxnTimeout: Boolean = false,
    /** Decode row images through the versioned catalog BEFORE the sink —
      * the reference's DataAugmenter order (cells land decoded, each row
      * against the schema version active at its position:
      * [[graft.augment.RowDecoder.decodeAllTablesVersioned]]). Requires
      * `schemaCatalog`. Off by default: the raw-cell sink is the
      * time-machine's storage contract and decode stays available on the
      * read side; turn on when downstream consumers read the sink
      * directly. */
    decodeWithCatalog: Boolean = false
)

final case class TableFilterConfig(include: Seq[String] = Nil, excludePattern: Option[String] = None)

object ReplicatorPipeline {

  /** The shared transform: ops → committed stamped rows, filtered and routed.
    * Works identically over a batch Dataset and a streaming one (the
    * assembler's flatMapGroupsWithState runs in both modes). */
  def transform(ops: Dataset[Op], cfg: PipelineConfig): Dataset[StampedOp] = {
    // whitelist AND blacklist (reference: AugmenterContext.java:711-730
    // shouldAugmentTable = !excluded && included): a table must pass BOTH
    // gates — not be excluded, and be in the include list when one is set.
    val filtered =
      if (cfg.tables.include.isEmpty && cfg.tables.excludePattern.isEmpty) ops
      else ops.filter { op =>
        op.kind == "BEGIN" || op.kind == "COMMIT" || op.kind == "DDL" || {
          (cfg.tables.include.isEmpty || cfg.tables.include.contains(op.table)) &&
            cfg.tables.excludePattern.forall(p => !op.table.matches(p))
        }
      }
    if (!filtered.isStreaming) {
      // bounded input (backfills, binlog-flusher analog): the column-native
      // window formulation — identical semantics, no GroupState encoder
      // round-trips, whole-stage codegen end-to-end
      TransactionAssembler.assembleBatch(filtered)
    } else {
      val timeout =
        if (cfg.abandonedTxnTimeout)
          org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout()
        else org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()
      TransactionAssembler.assemble(filtered, cfg.txnSizeLimit, timeout)
    }
  }

  /** Route a stamped micro-batch by the configured partitioner strategy
    * (reference: Partitioner.java:14-103) before the sink write. */
  def route(df: DataFrame, cfg: PipelineConfig): DataFrame = cfg.partitioner match {
    case "TRID"       => df.repartition(cfg.partitions, col("txnUuid"))
    case "XXID"       => df.repartition(cfg.partitions, col("xxid"))
    case "TABLE_NAME" => df.repartition(cfg.partitions, col("table"))
    case "RANDOM"     => df.repartition(cfg.partitions)
    case "NONE"       => df.coalesce(1)
    case other        => throw new IllegalArgumentException(s"unknown partitioner $other")
  }

  /** One micro-batch through the sink side: DDL barrier events update the
    * versioned schema catalog sequentially (binlog order = eventId order)
    * and land in the history sink (reference: Augmenter.java:210-225 +
    * HBaseSchemaManager.writeSchemaSnapshot); row events become versioned
    * cells; sampled validation tasks emit beside them. */
  private def writeBatch(batch: Dataset[StampedOp], cfg: PipelineConfig, batchId: Long = -1L): Unit = {
    val spark = batch.sparkSession
    cfg.schemaCatalog.foreach { cat =>
      // DDL is rare and tiny: collecting it to the driver is O(statements),
      // and catalog updates MUST be sequential — this is the one place the
      // reference's single-threaded semantics are load-bearing.
      val ddls = batch.filter(_.kind == "DDL").collect().sortBy(_.eventId)
      val txBefore = cat.transitions.length
      ddls.foreach(d => cat.applyDdl(d.after.getOrElse("ddl", ""), d.commitTsMs))
      if (ddls.nonEmpty) {
        cfg.schemaHistoryDir.foreach { hd =>
          cat.historyDf(spark).write.mode("overwrite").parquet(hd)
        }
        // registry sync for the Kafka path: each table this batch's DDLs
        // touched re-registers its subject through the compat gate
        cfg.schemaRegistryDir.foreach { rd =>
          val reg = new graft.sink.FileSchemaRegistry(rd)
          cat.transitions.drop(txBefore).map(_.table).distinct
            .filter(_.nonEmpty).foreach { tbl =>
              cat.current(tbl).foreach { sch =>
                reg.registerWithCompatHandling(
                  graft.sink.AvroPresenter.subject(cat.ownSchema, tbl),
                  graft.sink.AvroPresenter.avroSchema(sch))
              }
            }
        }
      }
    }
    val routed0 = route(batch.filter(_.kind != "DDL").toDF(), cfg)
    // versioned decode AFTER the catalog absorbed this batch's DDL (rows
    // that precede an in-batch barrier still resolve to the older version
    // by position — the when-chain keys on commitTsMs, not batch order)
    val routed =
      if (cfg.decodeWithCatalog) cfg.schemaCatalog match {
        case Some(cat) =>
          graft.augment.RowDecoder.decodeAllTablesVersioned(routed0, col("commitTsMs"), cat)
        case None => throw new IllegalArgumentException(
          "decodeWithCatalog requires a schemaCatalog")
      } else routed0
    val df = cfg.payloadTable match {
      case Some(p) => routed.withColumn("rowKey",
        when(col("table") === p, col("txnUuid")).otherwise(col("rowKey")))
      case None => routed
    }
    TimeMachineSink.write(df, cfg.sinkDir, batchId)
    cfg.validationDir.foreach { vd =>
      Sinks.validationSample(df, cfg.validationSampleN, "rowKey")
        .write.mode("append").parquet(vd)
    }
  }

  /** Launch the streaming pipeline over a stream of Ops. */
  def start(ops: Dataset[Op], cfg: PipelineConfig): StreamingQuery = {
    // pre-flight: loud, actionable failure when the checkpoint's state
    // encoders don't match this engine (e.g. a pre-r5 checkpoint whose
    // SupplierState lacks pendingXa), instead of an opaque state-store
    // deserialization error mid-restore
    graft.streaming.StateFormat.ensure(cfg.checkpointDir)
    val stamped = transform(ops, cfg)
    stamped.writeStream
      .outputMode("append")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: Dataset[StampedOp], batchId: Long) => writeBatch(batch, cfg, batchId) }
      .start()
  }

  /** Batch replay of a bounded op set through the identical transform+sink
    * path — used for backfills (the binlog-flusher analog, SURVEY §2.1 S4)
    * and in tests. */
  def runBatch(ops: Dataset[Op], cfg: PipelineConfig): Unit =
    writeBatch(transform(ops, cfg), cfg)
}
