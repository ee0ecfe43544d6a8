package graft

import org.apache.spark.sql.SparkSession

import graft.checkpoint.ProgressListener
import graft.pipeline.{PipelineConfig, ReplicatorPipeline}
import graft.sources.OpSource

/** Streaming soak: run the full CDC pipeline (rate source → transaction
  * assembly → time-machine sink) for a fixed wall-clock and report sustained
  * events/s + batch-latency percentiles against the reference's 5 s
  * safe-checkpoint envelope (BASELINE.md B2/B3).
  *
  * Usage: sbt "runMain graft.Soak [rps] [seconds] [lane] [servers]" — lane
  * `ops` (default) feeds pre-normalized ops; lane `raw` feeds four-event raw
  * binlog blocks through the streaming supplier state machine
  * (RawBinlogAdapter.toOpsStreaming) first, fanned across `servers`
  * simulated server groups (default 1).
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val rps = args.headOption.map(_.toInt).getOrElse(20000)
    val seconds = args.lift(1).map(_.toInt).getOrElse(60)
    val lane = args.lift(2).getOrElse("ops")
    val servers = args.lift(3).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("soak").toString
    val listener = new ProgressListener
    spark.streams.addListener(listener)
    val cfg = PipelineConfig(s"$dir/sink", s"$dir/ckpt", partitions = cpus.toInt, triggerMs = 1000L)
    val ops =
      if (lane == "raw")
        graft.operators.RawBinlogAdapter.toOpsStreaming(
          OpSource.rawRateStream(spark, rps, servers = servers))
      else OpSource.rateStream(spark, rps)
    val q = ReplicatorPipeline.start(ops, cfg)
    Thread.sleep(seconds * 1000L)
    q.stop()

    val batches = listener.batches.filter(_.inputRows > 0)
    val rows = batches.map(_.inputRows).sum
    val durs = batches.map(_.durationMs).sorted
    def pct(p: Double) = if (durs.isEmpty) 0L else durs(math.min(durs.length - 1, (p * durs.length).toInt))
    val eps = rows.toDouble / seconds
    println(f"""{"metric":"soak_events_per_sec","lane":"$lane%s","value":$eps%.0f,"unit":"events/s","rows":$rows,"batches":${batches.length},"p50_batch_ms":${pct(0.5)},"p95_batch_ms":${pct(0.95)},"target_envelope_ms":5000}""")
    spark.stop()
  }
}
