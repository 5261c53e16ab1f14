package graft.parser

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.model.{Errors, TimeFns}

/** Derived summary models (SURVEY §1.1), mirroring the reference's pydantic
  * models in `composable_logs/opentelemetry_task_span_parser.py:238-375`.
  * Validation that pydantic performs at construction is done in the
  * constructors/factories here.
  */
case class Timing(startTimeIso8601: String, endTimeIso8601: String) {
  def startEpochUs: Long = TimeFns.iso8601ToEpochUs(startTimeIso8601)
  def endEpochUs: Long = TimeFns.iso8601ToEpochUs(endTimeIso8601)
  def durationS: Double = TimeFns.durationRoundedS(startEpochUs, endEpochUs)
  def epochUsRange: (Long, Long) = (startEpochUs, endEpochUs)

  def asDict: Map[String, Any] = Map(
    "start_iso8601" -> startTimeIso8601,
    "end_iso8601" -> endTimeIso8601,
    "duration_s" -> durationS)
}

/** `LoggedValueContent` (`opentelemetry_task_span_parser.py:176-187`). */
case class LoggedValueContent(tpe: String, content: Any) {
  require(Set("utf-8", "bytes", "float", "bool", "json", "int").contains(tpe),
    s"LoggedValueContent: invalid type $tpe")
  def asDict: Map[String, Any] = Map("type" -> tpe, "value" -> content)
}

/** `ArtifactContent` (`opentelemetry_task_span_parser.py:119-144`):
  * content is utf-8 text or raw bytes; `write` picks the matching file API. */
case class ArtifactContent(name: String, tpe: String, content: Any) {
  require(Set("utf-8", "bytes").contains(tpe),
    s"ArtifactContent: invalid type $tpe")

  def contentLength: Int = content match {
    case s: String => s.length
    case b: Array[Byte] => b.length
    case other => throw new IllegalStateException(s"Bad content: $other")
  }

  def metadataAsDict: Map[String, Any] =
    Map("name" -> name, "type" -> tpe, "length" -> contentLength)

  def write(filepath: Path): Unit = {
    Files.createDirectories(filepath.getParent)
    content match {
      case s: String if tpe == "utf-8" =>
        Files.write(filepath, s.getBytes(StandardCharsets.UTF_8))
      case b: Array[Byte] if tpe == "bytes" => Files.write(filepath, b)
      case _ => throw new IllegalStateException("Internal error")
    }
  }
}

/** `TaskRunSummary` (`opentelemetry_task_span_parser.py:282-343`). */
case class TaskRunSummary(
    spanId: String,
    parentSpanId: String,
    taskId: String,
    exceptions: Seq[Map[String, Any]],
    attributes: Map[String, Any],
    timing: Timing,
    loggedValues: Map[String, LoggedValueContent],
    loggedArtifacts: Seq[ArtifactContent]) {
  require(spanId.startsWith("0x"),
    s"Tried to initialize OpenTelemetry span with id=$spanId. " +
      "Expected id to start with 0x.")
  require(taskId.nonEmpty, "task_id should be non-empty")

  def getArtifact(artifactName: String): ArtifactContent =
    Errors.one(loggedArtifacts.filter(_.name == artifactName))

  def isSuccess: Boolean = exceptions.isEmpty
  def isFailure: Boolean = !isSuccess

  def asDict: Map[String, Any] = Map(
    "span_id" -> spanId,
    "parent_span_id" -> parentSpanId,
    "task_id" -> taskId) ++
    timing.asDict.map { case (k, v) => s"timing_$k" -> v } ++ Map(
    "is_success" -> isSuccess,
    "exceptions" -> exceptions,
    "attributes" -> attributes,
    "logged_values" -> loggedValues.map { case (k, v) => k -> v.asDict },
    "logged_artifacts" -> loggedArtifacts.map(_.metadataAsDict))
}

/** `WorkflowSummary` (`opentelemetry_task_span_parser.py:349-375`). */
case class WorkflowSummary(
    spanId: String,
    timing: Timing,
    attributes: Map[String, Any],
    taskRuns: Seq[TaskRunSummary],
    taskDependencies: Set[(String, String)]) {

  def isSuccess: Boolean = taskRuns.forall(_.isSuccess)
  def isFailure: Boolean = !isSuccess

  def asDict: Map[String, Any] = Map(
    "span_id" -> spanId) ++
    timing.asDict.map { case (k, v) => s"timing_$k" -> v } ++ Map(
    "task_dependencies" -> taskDependencies.toList.map(t => List(t._1, t._2)),
    "attributes" -> attributes)
}
