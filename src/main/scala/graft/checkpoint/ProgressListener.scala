package graft.checkpoint

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Progress/delay instrumentation — the engine-native form of the
  * reference's metrics plane (reference: Metrics.java, the coordinator/
  * applier delay gauges at Replicator.java:84-86 and KafkaApplier.java:
  * 112-123): per-batch input rows, processing duration, and event-time lag
  * (now − watermark ≙ now − safe checkpoint).
  */
final class ProgressListener extends StreamingQueryListener {

  final case class BatchProgress(batchId: Long, inputRows: Long, durationMs: Long,
                                 watermarkDelayMs: Option[Long], timestampMs: Long)

  private val log = new ConcurrentLinkedQueue[BatchProgress]()

  def batches: Seq[BatchProgress] = log.asScala.toSeq

  /** The applier-delay SLI: now − last event-time watermark. */
  def currentDelayMs: Option[Long] = batches.lastOption.flatMap(_.watermarkDelayMs)

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val wmDelay = Option(p.eventTime.get("watermark")).flatMap { wm =>
      try Some(System.currentTimeMillis() - java.time.Instant.parse(wm).toEpochMilli)
      catch { case _: Exception => None }
    }
    log.add(BatchProgress(p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L),
      wmDelay, System.currentTimeMillis()))
  }
}
