package graft.sink

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.avro.Schema

import scala.jdk.CollectionConverters._

/** File-backed schema-registry analog (Confluent-shaped: subjects holding
  * ordered schema versions), driver-side state for the Kafka sink path.
  *
  * Implements the reference's incompatible-DDL workflow (reference:
  * KafkaApplier.handleIncompatibleSchemaChange, KafkaApplier.java:261-287):
  * when a DDL produces an Avro schema that cannot read data written under
  * the subject's latest version, the subject is DELETED and the new schema
  * re-registered from version 1 — consumers resubscribe from a clean
  * lineage instead of the producer wedging on registry rejection.
  */
final class FileSchemaRegistry(dir: String) {

  final case class Registration(version: Int, forced: Boolean)

  private def subjectDir(subject: String) = new File(dir, subject)

  def versions(subject: String): Seq[Int] = {
    val d = subjectDir(subject)
    if (!d.isDirectory) Nil
    else d.list().toSeq.collect { case s if s.matches("v\\d+\\.avsc") =>
      s.stripPrefix("v").stripSuffix(".avsc").toInt
    }.sorted
  }

  def schemaOf(subject: String, version: Int): Schema =
    new Schema.Parser().parse(
      Files.readString(Paths.get(dir, subject, s"v$version.avsc")))

  def latest(subject: String): Option[(Int, Schema)] =
    versions(subject).lastOption.map(v => v -> schemaOf(subject, v))

  /** Append a new version (idempotent: re-registering the latest schema
    * returns its existing version). */
  def register(subject: String, schema: Schema): Int =
    latest(subject) match {
      case Some((v, s)) if s == schema => v
      case other =>
        val v = other.map(_._1 + 1).getOrElse(1)
        val d = subjectDir(subject)
        d.mkdirs()
        Files.writeString(d.toPath.resolve(s"v$v.avsc"), schema.toString(true))
        v
    }

  def deleteSubject(subject: String): Unit = {
    val d = subjectDir(subject)
    if (d.isDirectory) {
      Files.walk(d.toPath).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** The reference's DDL flow: compatible change → next version; incompatible
    * change → delete the subject and re-register from version 1
    * (KafkaApplier.java:261-287). */
  def registerWithCompatHandling(subject: String, newSchema: Schema): Registration =
    latest(subject) match {
      case Some((_, old)) if !AvroPresenter.isBackwardCompatible(newSchema, old) =>
        deleteSubject(subject)
        Registration(register(subject, newSchema), forced = true)
      case _ =>
        Registration(register(subject, newSchema), forced = false)
    }
}
