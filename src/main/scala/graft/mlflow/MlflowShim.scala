package graft.mlflow

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import scala.collection.immutable.ListMap

import graft.exec.{Engine, SpanContext}
import graft.model.Json

/** F2 — stateless MLflow-protocol shim
  * (`composable_logs/mlflow_server/server.py`): translates MLflow REST
  * calls into the engine's typed logging (named-value/artefact spans).
  *
  * Protocol parity with the reference:
  *  - the OTel traceparent rides in the HTTP basic-auth USERNAME; the
  *    static password only validates client configuration (`:46-62`);
  *  - params/tags are logged as strings (stringified upstream by the
  *    MLflow client), tags get a `tags.` prefix, metrics stay float with
  *    `step`/`timestamp` accepted but discarded (`:118-210`);
  *  - nested runs and unknown endpoints are rejected with 501 (`:90-95`,
  *    `:218-234`).
  *
  * Artifacts upload two ways: HTTP PUT `/artifacts/<traceparent>/<path>`
  * (the simpler transport) or the reference-faithful anonymous-write FTP
  * endpoint ([[MlflowFtp]], RFC 959 subset on JDK sockets) — either way
  * the path determines the owning task and content is bytes-typed.
  */
object MlflowShim {
  val ServerPassword = "composable-logs-login"

  sealed trait Result
  case class Ok(body: Map[String, Any]) extends Result
  case class Err(status: Int, detail: String) extends Result

  /** The pure, HTTP-free translation layer (all testable semantics). */
  final class Translator(
      logString: (String, String, String) => Unit, // (traceparent, key, value)
      logFloat: (String, String, Double) => Unit,
      logBytes: (String, String, Array[Byte]) => Unit,
      artifactUriBase: String) {

    private def runResponse(traceparent: String): Map[String, Any] = Map(
      "run" -> ListMap(
        "info" -> ListMap(
          "run_id" -> traceparent,
          "run_uuid" -> traceparent,
          "artifact_uri" -> s"$artifactUriBase/$traceparent/")))

    def handle(method: String, path: String, traceparent: String, body: String): Result = {
      def json: collection.Map[String, Any] =
        Json.parse(body).asInstanceOf[collection.Map[String, Any]]

      (method, path) match {
        case ("POST", "/api/2.0/mlflow/runs/create") =>
          val tags = json.getOrElse("tags", Vector.empty).asInstanceOf[Vector[Any]]
          val tagKeys = tags.map(_.asInstanceOf[collection.Map[String, Any]]("key"))
          if (tagKeys.contains("mlflow.parentRunId"))
            Err(501, "POST /api/2.0/mlflow/runs/create --- nested runs are not supported")
          else Ok(runResponse(traceparent))

        case ("POST", "/api/2.0/mlflow/runs/update") => Ok(Map.empty)
        case ("GET", "/api/2.0/mlflow/runs/get") => Ok(runResponse(traceparent))

        case ("POST", "/api/2.0/mlflow/runs/log-parameter") =>
          val j = json
          require(j.keySet == Set("run_uuid", "run_id", "key", "value"))
          logString(traceparent,
            j("key").asInstanceOf[String], j("value").asInstanceOf[String])
          Ok(Map.empty)

        case ("POST", "/api/2.0/mlflow/runs/log-batch") =>
          val j = json
          require(j.keySet.subsetOf(Set("run_id", "metrics", "params")))
          j.getOrElse("params", Vector.empty).asInstanceOf[Vector[Any]].foreach { p =>
            val pm = p.asInstanceOf[collection.Map[String, Any]]
            logString(traceparent,
              pm("key").asInstanceOf[String], pm("value").asInstanceOf[String])
          }
          // batch ingestion of metrics not supported (matches reference)
          Ok(Map.empty)

        case ("POST", "/api/2.0/mlflow/runs/set-tag") =>
          val j = json
          require(j.keySet == Set("run_uuid", "run_id", "key", "value"))
          logString(traceparent,
            "tags." + j("key").asInstanceOf[String], j("value").asInstanceOf[String])
          Ok(Map.empty)

        case ("POST", "/api/2.0/mlflow/runs/log-metric") =>
          val j = json
          require(j.keySet == Set("run_uuid", "run_id", "key", "value", "timestamp", "step"))
          val v = j("value") match {
            case d: Double => d
            case l: Long => l.toDouble // json int for integral metrics
            case other => throw new IllegalArgumentException(s"metric value: $other")
          }
          logFloat(traceparent, j("key").asInstanceOf[String], v)
          Ok(Map.empty) // step + timestamp accepted but discarded

        case ("GET", "/status") => Ok(Map("status" -> "OK"))

        case ("PUT", p) if p.startsWith("/artifacts/") =>
          Err(501, "artifact PUT must be handled with raw bytes") // see server

        case (m, p) =>
          Err(501, s"$m $p not supported in state-less mlflow-to-opentelemetry log collector")
      }
    }

    def handleArtifactPut(path: String, bytes: Array[Byte]): Result = {
      // /artifacts/<traceparent>/<artifact/sub/path>
      val rest = path.stripPrefix("/artifacts/")
      val idx = rest.indexOf('/')
      if (idx <= 0 || idx == rest.length - 1)
        return Err(400, s"artifact path must be /artifacts/<traceparent>/<name>: $path")
      val (tp, name) = (rest.take(idx), rest.drop(idx + 1))
      // artifact names flow into filesystem sinks later — reject absolute
      // and traversal names at the protocol boundary (the reference's FTP
      // server confined uploads to its home dir; the HTTP re-scope must too)
      if (name.startsWith("/") || name.split("/").contains(".."))
        return Err(400, s"artifact name rejected (absolute or traversal): $name")
      logBytes(tp, name, bytes)
      Ok(Map.empty)
    }
  }

  def translatorFor(engine: Engine, artifactUriBase: String): Translator =
    new Translator(
      (tp, k, v) => engine.loggerFor(tp).logString(k, v),
      (tp, k, v) => engine.loggerFor(tp).logFloat(k, v),
      (tp, name, bytes) => engine.loggerFor(tp).logArtefact(name, bytes),
      artifactUriBase)

  /** Minimal HTTP server over the translator (JDK built-in httpserver — no
    * external deps in the offline environment). Returns the bound server;
    * `stop()` it when the run completes. */
  def start(engine: Engine, port: Int = 0): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val base = s"http://127.0.0.1:${server.getAddress.getPort}/artifacts"
    val translator = translatorFor(engine, base)

    server.createContext("/", (exchange: HttpExchange) => {
      val result =
        try {
          // /status is the unauthenticated readiness poll (protocol parity:
          // the reference polls it with no credentials during startup)
          if (exchange.getRequestMethod == "GET" &&
            exchange.getRequestURI.getPath == "/status")
            Ok(Map("status" -> "OK"))
          else authTraceparent(exchange) match {
            case Left(err) => err
            case Right(traceparent) =>
              val method = exchange.getRequestMethod
              val path = exchange.getRequestURI.getPath
              val rawBody = exchange.getRequestBody.readAllBytes()
              if (method == "PUT" && path.startsWith("/artifacts/"))
                translator.handleArtifactPut(path, rawBody)
              else {
                val body = new String(rawBody, StandardCharsets.UTF_8)
                translator.handle(method, path, traceparent,
                  if (body.isEmpty) "{}" else body)
              }
          }
        } catch {
          case e: Exception => Err(500, Option(e.getMessage).getOrElse("error"))
        }
      val (status, bodyOut) = result match {
        case Ok(m) => (200, Json.render(m))
        case Err(code, detail) => (code, Json.render(Map("detail" -> detail)))
      }
      val bytes = bodyOut.getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(status, bytes.length)
      val os: OutputStream = exchange.getResponseBody
      os.write(bytes)
      os.close()
    })
    server.start()
    server
  }

  private def authTraceparent(exchange: HttpExchange): Either[Err, String] = {
    val auth = Option(exchange.getRequestHeaders.getFirst("Authorization"))
    auth match {
      case Some(h) if h.startsWith("Basic ") =>
        val decoded = new String(
          Base64.getDecoder.decode(h.drop(6)), StandardCharsets.UTF_8)
        decoded.split(":", 2) match {
          case Array(user, pass) if pass == ServerPassword => Right(user)
          case _ => Left(Err(500,
            "MLFlow client is not correctly set up! Please set environment " +
              "variables by calling configure_mlflow_connection_variables before " +
              "logging using the MLFlow client."))
        }
      case _ => Left(Err(401, "missing basic auth"))
    }
  }
}
