package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardOpenOption}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Timeout-resilient by construction (round-10 postmortem: the driver's
  * CORRECTNESS_r10.json came back `{}` because the sweep outgrew the
  * driver's wall-time budget):
  *   - oracle_sql.json is written FIRST, before any query runs, so a
  *     mid-sweep kill still leaves the full oracle map on disk;
  *   - each query's parquet lands as the query finishes (was already
  *     true) and a per-query timing line is appended to
  *     verify_timings.jsonl as it completes — a partial sweep leaves a
  *     partial-but-valid artifact, never an empty one;
  *   - total wall time is printed as one stdout JSON line at the end
  *     (and is also derivable from the jsonl), so harness-cost drift is
  *     visible per round before it zeroes an artifact.
  */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional third arg: comma-separated query names — fast single-query
    // iteration (the driver never passes it, so its runs stay full)
    val only: Set[String] = if (args.length > 2) args(2).split(",").toSet else Set.empty
    // default to the box's cores (capped at 32): the r10 sweep ran at the
    // old local[4] default on a 32-core driver box — 4x the wall time the
    // hardware had to give, and the round's artifact timed out to `{}`
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // Oracle map FIRST: a driver timeout mid-sweep must still find it.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // untimed warmup: the first query otherwise absorbs the JVM/session
    // cold-start (parquet datasource + codegen compiler + codec plugin
    // init, ~9 s) and shows up as a phantom top offender in the timings
    // artifact (r11: mm_phash_neardup "11.4 s" was 1.5 s warm)
    try {
      val wu = Files.createTempDirectory("graft-verify-warmup")
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count().coalesce(1)
        .write.mode("overwrite").parquet(wu.resolve("w").toString)
      import scala.reflect.io.Directory
      new Directory(wu.toFile).deleteRecursively(); ()
    } catch { case _: Throwable => () }
    val timingsPath = Paths.get(s"$outDir/verify_timings.jsonl")
    Files.deleteIfExists(timingsPath)
    val t0 = System.nanoTime()
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .toSeq
    // SPARK_GRAFT_VERIFY_PAR > 1 runs several queries in flight at once —
    // LOCAL ITERATION ONLY. A 4-way full-sweep trial produced one
    // VALUE_MISMATCH (q_pagerank's iterative ranks lost mass — a
    // cache-clear/unpersist race against a mid-loop reader that a 12-query
    // concurrent graph-lane repro did NOT reproduce), so the gate default
    // stays sequential: correctness of the driver artifact outranks sweep
    // wall time, and the 32-core default above is already the 2.5× lever.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "1").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, par))
    val tasks = todo.map { case (name, fn) =>
      pool.submit(new Runnable { def run(): Unit = {
        val tq = System.nanoTime()
        // one retry: a transient local-FS hiccup (staging-commit chmod race
        // seen under tmp pressure) must not red-flag a correct query
        def attempt(): Option[Throwable] =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            None
          } catch { case e: Throwable => Some(e) }
        attempt().foreach { e1 =>
          System.err.println(s"[verify] $name attempt 1 failed (retrying): ${e1.getMessage}")
          attempt().foreach(e2 =>
            System.err.println(s"[verify] $name failed: ${e2.getMessage}"))
        }
        val sec = (System.nanoTime() - tq) / 1e9
        val n = done.incrementAndGet()
        Verify.synchronized {
          Files.writeString(timingsPath,
            s"""{"q":${q(name)},"sec":${f"$sec%.2f"}}""" + "\n",
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        }
        // queries persist() intermediates scoped to their own run; drop them
        // so 200+ queries in one JVM don't accumulate cache pressure (in
        // sequential mode this is the every-query cadence of rounds 1-10)
        if (par == 1 || n % 8 == 0) spark.sharedState.cacheManager.clearCache()
      }})
    }
    tasks.foreach(_.get())
    pool.shutdown()
    val totalSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"verify","completed":${done.get()},"verify_sec":${f"$totalSec%.1f"}}""")
    spark.stop()
  }
}
