package graft.streaming

/** Versioning for the engine's streaming state-encoder schemas.
  *
  * flatMapGroupsWithState state rows are stored in the checkpoint encoded
  * against a case-class schema ([[graft.operators.RawBinlogAdapter.SupplierState]],
  * the assembler's TxnState). When such a class changes shape — as
  * SupplierState did when it gained `pendingXa` (XA two-phase, round 5) —
  * a restart against an older checkpoint fails deep inside state-store
  * deserialization with no hint of what happened. This sidecar turns that
  * into a loud, actionable pre-flight error, the same posture as
  * OpLogSource's purged-retention loud-fail.
  *
  * Mechanics: on first start, [[ensure]] stamps
  * `<checkpoint>/graft-state-format.json` with the engine's current
  * format-version map. On restart it compares, and mismatches (or a
  * checkpoint that carries streaming state but predates stamping) raise an
  * IllegalStateException naming the found and expected versions and the
  * two ways out (fresh checkpoint dir, or migrate/stamp). Non-local
  * checkpoint schemes (hdfs:/s3a:) skip the check with a warning rather
  * than writing a junk local path — the same guard OpLogSource applies to
  * its announce-floor file. */
object StateFormat {

  /** v1: rounds 1-4 (gtid + tableMaps). v2: round 5+ (+ pendingXa). */
  val SupplierStateVersion = 2

  /** Transaction-assembler per-txn buffer state, unchanged since round 1. */
  val AssemblerStateVersion = 1

  /** Every stateful component's current format, stamped at query start. */
  def currentVersions: Map[String, Int] = Map(
    "supplier" -> SupplierStateVersion,
    "assembler" -> AssemblerStateVersion)

  private val FileName = "graft-state-format.json"

  private def isLocal(dir: String): Boolean =
    try {
      val scheme = new java.net.URI(dir).getScheme
      scheme == null || scheme == "file"
    } catch { case _: Throwable => true }

  private def localPath(dir: String): java.io.File = {
    val u = try new java.net.URI(dir) catch { case _: Throwable => null }
    val base = if (u != null && u.getScheme == "file") new java.io.File(u)
               else new java.io.File(dir)
    new java.io.File(base, FileName)
  }

  private[graft] def parse(txt: String): Map[String, Int] =
    """"([A-Za-z0-9_]+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toInt).toMap

  private def render(m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")

  /** True when `dir` already holds a streaming checkpoint (offsets written
    * or state stored) — the situations where format provenance matters. */
  private def hasExistingState(dir: java.io.File): Boolean = {
    def nonEmptyDir(name: String): Boolean = {
      val d = new java.io.File(dir, name)
      d.isDirectory && {
        val ls = d.listFiles()
        ls != null && ls.nonEmpty
      }
    }
    nonEmptyDir("offsets") || nonEmptyDir("state")
  }

  /** Pre-flight check + stamp for a query's checkpoint dir. Call before
    * `.start()` on any query holding engine state. Fresh dir → stamps and
    * proceeds; matching stamp → proceeds (and merges any newly-declared
    * components in); mismatch or unstamped-but-stateful → actionable error. */
  def ensure(checkpointDir: String,
      versions: Map[String, Int] = currentVersions): Unit = {
    if (!isLocal(checkpointDir)) {
      System.err.println(s"[graft] state-format check skipped: non-local " +
        s"checkpoint scheme ($checkpointDir) — ensure state formats " +
        s"${render(versions)} match the checkpoint's provenance manually")
      return
    }
    val f = localPath(checkpointDir)
    val dir = f.getParentFile
    if (f.isFile) {
      val found = parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      val clashes = versions.collect {
        case (comp, want) if found.get(comp).exists(_ != want) =>
          s"$comp: checkpoint has state-format v${found(comp)}, engine expects v$want"
      }
      if (clashes.nonEmpty)
        throw new IllegalStateException(
          s"streaming checkpoint $checkpointDir was written by an engine with " +
          s"incompatible state formats — ${clashes.mkString("; ")}. " +
          s"Restart with a fresh checkpoint dir, or migrate the state and " +
          s"update $FileName.")
      if ((versions.keySet -- found.keySet).nonEmpty) {
        java.nio.file.Files.write(f.toPath, render(found ++ versions).getBytes("UTF-8"))
      }
    } else if (dir != null && dir.isDirectory && hasExistingState(dir)) {
      throw new IllegalStateException(
        s"streaming checkpoint $checkpointDir carries state but no " +
        s"$FileName — it predates state-format stamping (round ≤5), so its " +
        s"supplier state may be v1 (no pendingXa) while the engine expects " +
        s"v${SupplierStateVersion}. Restart with a fresh checkpoint dir; or, " +
        s"if the checkpoint is KNOWN to come from a current engine, stamp it " +
        s"by writing ${render(versions)} to $FileName in the checkpoint dir.")
    } else {
      if (dir != null) dir.mkdirs()
      java.nio.file.Files.write(f.toPath, render(versions).getBytes("UTF-8"))
    }
  }
}
