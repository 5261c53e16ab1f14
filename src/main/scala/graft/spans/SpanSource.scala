package graft.spans

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.{AttrCodec, Json, SpanContextRow, SpanEventRow, SpanLinkRow, SpanModel, SpanRow, SpanStatusRow}

/** Span ingestion (SURVEY §2 D1/F-group): JSONL glob, single JSON array
  * file, and zip archives holding `opentelemetry-spans.json` — the
  * reference's three at-rest formats (`opentelemetry_helpers.py:499-500`,
  * `otel_output_parser/cli_pynb_log_parser.py:120`,
  * `otel_output_parser/cli_generate_static_data.py:50-65`).
  *
  * Parsing runs distributed via `mapPartitions` (one span per JSONL line;
  * heterogeneous attribute values are re-rendered to the engine's
  * JSON-text attribute convention, [[graft.model.AttrCodec]]).
  */
object SpanSource {

  /** JSONL (one span object per line), glob-able path. */
  def readJsonl(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    implicit val enc = SpanModel.spanEncoder
    spark.read.textFile(path)
      .filter((l: String) => l.trim.nonEmpty)
      .mapPartitions(_.map(line => fromJsonValue(Json.parse(line))))
      .toDF()
  }

  /** Single file containing a JSON array of spans (driver-parsed: the
    * format is one-run-sized by construction). */
  def readJsonArray(spark: SparkSession, path: String): DataFrame = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8)
    fromJsonText(spark, text)
  }

  /** Zip archives: every member named `opentelemetry-spans.json` yields its
    * spans, with a lineage column `source_zip` — the Spark-idiomatic
    * multi-run layout (SURVEY §3.3). Distributed via binaryFile. */
  def readZips(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val enc =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, SpanModel.spanEncoder)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (zipPath, bytes) =>
        extractSpansJson(bytes).flatMap { text =>
          Json.parse(text).asInstanceOf[Vector[Any]]
            .map(v => (zipPath, fromJsonValue(v)))
        }
      })
      .toDF("source_zip", "span")
      .select(col("source_zip"), col("span.*"))
  }

  /** ALL members named `opentelemetry-spans.json` (at any directory level);
    * a zip holding several runs' span files loses none of them. */
  private[spans] def extractSpansJson(zipBytes: Array[Byte]): Seq[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collect {
          case e if e.getName == "opentelemetry-spans.json" ||
              e.getName.endsWith("/opentelemetry-spans.json") =>
            new String(zin.readAllBytes(), StandardCharsets.UTF_8)
        }
        .toList
    } finally zin.close()
  }

  def fromJsonText(spark: SparkSession, text: String): DataFrame = {
    val spans = Json.parse(text).asInstanceOf[Vector[Any]].map(fromJsonValue)
    SpanModel.toDF(spark, spans)
  }

  private def parseContext(v: Option[Any]): SpanContextRow = v match {
    case Some(c: collection.Map[_, _]) =>
      val cm = c.asInstanceOf[collection.Map[String, Any]]
      SpanContextRow(
        cm.get("trace_id").map(_.toString).orNull,
        cm.get("span_id").map(_.toString).orNull,
        cm.get("trace_state").map(_.toString).getOrElse("[]"))
    case _ => SpanContextRow(null, null, "[]")
  }

  /** One parsed JSON object → SpanRow. Tolerates missing keys the way the
    * reference's dict accesses do (absent → null/empty). */
  def fromJsonValue(v: Any): SpanRow = {
    val m = v.asInstanceOf[ListMap[String, Any]]
    def str(k: String): String = m.get(k).map(_.asInstanceOf[String]).orNull
    def attrMap(x: Any): Map[String, String] = x match {
      case null => Map.empty
      case mm: collection.Map[_, _] =>
        mm.map { case (k, vv) => k.toString -> Json.render(vv) }.toMap
      case _ => Map.empty
    }
    val ctx = parseContext(m.get("context"))
    val status = m.get("status") match {
      case Some(s: collection.Map[_, _]) =>
        val sm = s.asInstanceOf[collection.Map[String, Any]]
        SpanStatusRow(
          sm.get("status_code").map(_.toString).getOrElse("UNSET"),
          sm.get("description").map(_.asInstanceOf[String]))
      case _ => SpanStatusRow("UNSET", None)
    }
    val events = m.get("events") match {
      case Some(es: Vector[_]) => es.map { e =>
        val em = e.asInstanceOf[collection.Map[String, Any]]
        SpanEventRow(
          em.get("name").map(_.toString).orNull,
          em.get("timestamp").map(_.toString).orNull,
          attrMap(em.getOrElse("attributes", null)))
      }
      case _ => Seq.empty
    }
    val links = m.get("links") match {
      case Some(ls: Vector[_]) => ls.map { l =>
        val lm = l.asInstanceOf[collection.Map[String, Any]]
        SpanLinkRow(parseContext(lm.get("context")),
          attrMap(lm.getOrElse("attributes", null)))
      }
      case _ => Seq.empty
    }
    SpanRow(
      name = str("name"),
      context = ctx,
      parent_id = m.get("parent_id").flatMap(Option(_)).map(_.toString),
      kind = Option(str("kind")).getOrElse("SpanKind.INTERNAL"),
      start_time = str("start_time"),
      end_time = str("end_time"),
      status = status,
      attributes = attrMap(m.getOrElse("attributes", null)),
      events = events,
      links = links,
      resource = attrMap(m.getOrElse("resource", null)))
  }
}
