package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateFormat

/** Checkpoint state-format stamping: fresh-start stamps, matching restart
  * passes, and the two failure shapes (version clash, pre-stamping
  * checkpoint with state) raise actionable errors — pure file logic, no
  * SparkSession needed. */
class StateFormatSpec extends AnyFunSuite {

  private def tmp(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("sfmt").toFile
    d.deleteOnExit(); d
  }

  private def sidecar(dir: java.io.File) =
    new java.io.File(dir, "graft-state-format.json")

  test("fresh checkpoint dir: stamps the current versions and proceeds") {
    val d = new java.io.File(tmp(), "ckpt")
    StateFormat.ensure(d.toString)
    assert(sidecar(d).isFile)
    val stamped = StateFormat.parse(
      new String(java.nio.file.Files.readAllBytes(sidecar(d).toPath), "UTF-8"))
    assert(stamped == StateFormat.currentVersions)
    assert(stamped("supplier") == 2) // pendingXa era
  }

  test("restart with a matching stamp passes; newly-declared components merge in") {
    val d = new java.io.File(tmp(), "ckpt")
    StateFormat.ensure(d.toString, Map("supplier" -> 2))
    StateFormat.ensure(d.toString) // full current map: supplier matches, assembler merges
    val stamped = StateFormat.parse(
      new String(java.nio.file.Files.readAllBytes(sidecar(d).toPath), "UTF-8"))
    assert(stamped == StateFormat.currentVersions)
    StateFormat.ensure(d.toString) // and the full map round-trips
  }

  test("version clash: actionable error naming found and expected versions") {
    val d = new java.io.File(tmp(), "ckpt")
    d.mkdirs()
    java.nio.file.Files.write(sidecar(d).toPath,
      """{"assembler":1,"supplier":1}""".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](StateFormat.ensure(d.toString))
    assert(e.getMessage.contains("state-format v1"))
    assert(e.getMessage.contains("expects v2"))
    assert(e.getMessage.contains("fresh checkpoint dir"))
  }

  test("pre-r5-shaped checkpoint (state, no sidecar): actionable error, not a decode surprise") {
    // simulate a checkpoint written by an older engine: offsets + state
    // dirs with content, no graft-state-format.json
    val d = new java.io.File(tmp(), "ckpt")
    new java.io.File(d, "offsets").mkdirs()
    java.nio.file.Files.write(
      new java.io.File(d, "offsets/0").toPath, "v1".getBytes("UTF-8"))
    new java.io.File(d, "state").mkdirs()
    val e = intercept[IllegalStateException](StateFormat.ensure(d.toString))
    assert(e.getMessage.contains("predates state-format stamping"))
    assert(e.getMessage.contains("pendingXa"))
    assert(e.getMessage.contains("fresh checkpoint dir"))
    // the documented escape hatch: stamping the sidecar by hand unblocks
    java.nio.file.Files.write(sidecar(d).toPath,
      """{"assembler":1,"supplier":2}""".getBytes("UTF-8"))
    StateFormat.ensure(d.toString)
  }

  test("empty-but-existing dir (fresh start race shape) stamps and proceeds") {
    val d = new java.io.File(tmp(), "ckpt")
    d.mkdirs() // exists, but no offsets/state content yet
    StateFormat.ensure(d.toString)
    assert(sidecar(d).isFile)
  }

  test("non-local scheme skips with a warning instead of writing a junk path") {
    StateFormat.ensure("hdfs://nn:8020/ckpt/raw") // must not throw
  }
}
