package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.spans.GithubArtifacts
import graft.spans.GithubArtifacts.{ArtifactEntry, PageResult, Transport}

/** F1 — GitHub artifact source: pagination, expiry/name filtering, 410
  * tolerance, and cache behavior against a fake transport (ref semantics:
  * `otel_output_parser/common_helpers/github_helpers.py:15-164`). */
class GithubArtifactsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def entry(id: Int, name: String = "opentelemetry-outputs-v1",
      expired: Boolean = false) =
    ArtifactEntry(id.toString, name, expired)

  /** Pages of size `perPage` served from `entries`; `gone` ids 410 on
    * download; records every download attempt. */
  class FakeTransport(entries: Seq[ArtifactEntry], gone: Set[String] = Set.empty,
      totalCountOverride: Option[Long] = None) extends Transport {
    val downloads = scala.collection.mutable.ArrayBuffer.empty[String]
    override def listPage(repo: String, perPage: Int, page: Int): PageResult =
      PageResult(
        entries.slice((page - 1) * perPage, page * perPage),
        totalCountOverride.getOrElse(entries.size.toLong))
    override def download(repo: String, artifactId: String): Option[Array[Byte]] = {
      downloads += artifactId
      if (gone.contains(artifactId)) None
      else Some(s"zip-$artifactId".getBytes("UTF-8"))
    }
  }

  test("live-transport list-page parser maps the REST response shape") {
    val body =
      """{"total_count": 3, "artifacts": [
        |  {"id": 101, "name": "opentelemetry-outputs-v1-run7",
        |   "expired": false, "size_in_bytes": 2048},
        |  {"id": 102, "name": "coverage-report", "expired": false},
        |  {"id": 103, "name": "opentelemetry-outputs-v1-run8", "expired": true}
        |]}""".stripMargin
    val page = GithubArtifacts.parseListPage(body)
    assert(page.totalCount == 3L)
    assert(page.artifacts == Seq(
      ArtifactEntry("101", "opentelemetry-outputs-v1-run7", expired = false),
      ArtifactEntry("102", "coverage-report", expired = false),
      ArtifactEntry("103", "opentelemetry-outputs-v1-run8", expired = true)))
    // empty page: artifacts [] with the grand total still present
    val empty = GithubArtifacts.parseListPage("""{"total_count": 3, "artifacts": []}""")
    assert(empty.artifacts.isEmpty && empty.totalCount == 3L)
    // malformed responses fail loudly, not as silent empty pages
    intercept[IllegalStateException] {
      GithubArtifacts.parseListPage("""{"artifacts": []}""")
    }
    intercept[IllegalStateException] {
      GithubArtifacts.parseListPage("""{"total_count": 1, "artifacts": [{"name":"x"}]}""")
    }
  }

  test("live transport construction performs no I/O") {
    // offline safety: building the transport must not touch the network;
    // the wire layer is exercised only on first call (which this
    // environment cannot make — contract tests stay on the fake)
    val t = new GithubArtifacts.HttpTransport(token = "dummy")
    assert(t != null)
  }

  test("live transport against a loopback server: auth, redirect, 410") {
    // the wire layer end-to-end without egress: a JDK HttpServer plays
    // both the API host and the blob store. Pins the three behaviors the
    // reference's python flow gets for free from `requests` and the JDK
    // client does NOT: bearer auth reaches the API hop, the 302 to the
    // blob store is followed WITHOUT the Authorization header (a SAS URL
    // rejects it), and 410 means skip-not-fail.
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // the blob store is a SEPARATE server: a real artifact 302 lands on a
    // different origin, and the auth-stripping rule is origin-based
    val blobServer = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seenAuth = new java.util.concurrent.ConcurrentHashMap[String, String]()
    def record(ex: HttpExchange): Unit =
      seenAuth.put(ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("<none>"))
    def respond(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    val port = server.getAddress.getPort
    val blobPort = blobServer.getAddress.getPort
    server.createContext("/repos/o/r/actions/artifacts", (ex: HttpExchange) => {
      record(ex)
      ex.getRequestURI.getPath match {
        case p if p.endsWith("/7/zip") =>
          // API hop answers 302 to the blob store on the OTHER origin
          ex.getResponseHeaders.add("Location", s"http://127.0.0.1:$blobPort/blob/7")
          respond(ex, 302, Array.empty)
        case p if p.endsWith("/8/zip") =>
          respond(ex, 410, Array.empty) // expired between list and fetch
        case p if p.endsWith("/9/zip") =>
          // renamed repo: same-origin 301 onto the new repo path — python
          // requests KEEPS auth on a same-origin hop, and so must we
          ex.getResponseHeaders.add(
            "Location", s"http://127.0.0.1:$port/repos/o/r2/actions/artifacts/9/zip")
          respond(ex, 301, Array.empty)
        case p if p.endsWith("/artifacts") =>
          val q = Option(ex.getRequestURI.getQuery).getOrElse("")
          val body =
            if (q.contains("page=1"))
              """{"total_count": 1, "artifacts": [
                |  {"id": 7, "name": "opentelemetry-outputs-v1", "expired": false}
                |]}""".stripMargin
            else """{"total_count": 1, "artifacts": []}"""
          respond(ex, 200, body.getBytes("UTF-8"))
        case _ => respond(ex, 404, Array.empty)
      }
    })
    server.createContext("/repos/o/r2/actions/artifacts", (ex: HttpExchange) => {
      record(ex)
      // the renamed-repo target requires the bearer to have survived the hop
      if (Option(ex.getRequestHeaders.getFirst("Authorization"))
            .contains("Bearer tok123"))
        respond(ex, 200, "renamed!".getBytes("UTF-8"))
      else respond(ex, 401, Array.empty)
    })
    blobServer.createContext("/blob/7", (ex: HttpExchange) => {
      record(ex)
      // a SAS-signed store rejects bearer-carrying requests — replicate
      if (ex.getRequestHeaders.containsKey("Authorization"))
        respond(ex, 400, Array.empty)
      else respond(ex, 200, "zipbytes!".getBytes("UTF-8"))
    })
    server.start()
    blobServer.start()
    try {
      val t = new GithubArtifacts.HttpTransport(
        token = "tok123", apiBase = s"http://127.0.0.1:$port")
      val page = t.listPage("o/r", perPage = 30, page = 1)
      assert(page.totalCount == 1L &&
        page.artifacts == Seq(entry(7)))
      assert(seenAuth.get("/repos/o/r/actions/artifacts") == "Bearer tok123")
      val bytes = t.download("o/r", "7")
      assert(bytes.map(new String(_, "UTF-8")) == Some("zipbytes!"))
      assert(seenAuth.get("/repos/o/r/actions/artifacts/7/zip") == "Bearer tok123")
      assert(seenAuth.get("/blob/7") == "<none>",
        "Authorization must NOT cross the redirect to the blob store")
      assert(t.download("o/r", "8").isEmpty) // 410 → skip, not throw
      // renamed-repo 301: same-origin, so the bearer must survive the hop
      assert(t.download("o/r", "9").map(new String(_, "UTF-8")) == Some("renamed!"))
      assert(seenAuth.get("/repos/o/r2/actions/artifacts/9/zip") == "Bearer tok123",
        "Authorization must survive a same-origin redirect")
      // and the whole source path: list → filter → fetch via the LIVE wire
      val zips = GithubArtifacts.artifactZips(t, Some("o/r"), None).toVector
      assert(zips.map(new String(_, "UTF-8")) == Vector("zipbytes!"))
    } finally { server.stop(0); blobServer.stop(0) }
  }

  test("paginator walks pages until empty and checks total_count") {
    val t = new FakeTransport((1 to 7).map(entry(_)))
    val got = GithubArtifacts.listArtifacts(t, "owner/repo", perPage = 3)
    assert(got.map(_.id) == (1 to 7).map(_.toString))
    // a list that changed between pages (count mismatch) fails loudly
    val bad = new FakeTransport((1 to 7).map(entry(_)), totalCountOverride = Some(9L))
    val e = intercept[IllegalStateException] {
      GithubArtifacts.listArtifacts(bad, "owner/repo", perPage = 3)
    }
    assert(e.getMessage.contains("total_count"))
  }

  test("paginator throws instead of looping on a page-repeating transport") {
    // a broken proxy/retry layer that serves a full page 1 forever: the
    // first-empty-page stop condition never fires, so the page ceiling
    // derived from the server's own total_count must kill the loop
    val stuck = new Transport {
      override def listPage(repo: String, perPage: Int, page: Int): PageResult =
        PageResult((1 to perPage).map(entry(_)), 7L)
      override def download(repo: String, artifactId: String): Option[Array[Byte]] =
        None
    }
    val e = intercept[IllegalStateException] {
      GithubArtifacts.listArtifacts(stuck, "owner/repo", perPage = 3)
    }
    assert(e.getMessage.contains("overran"))
  }

  test("repo validation: format and token") {
    intercept[IllegalArgumentException] {
      GithubArtifacts.listArtifacts(new FakeTransport(Nil), "not-a-repo")
    }
    intercept[IllegalStateException] {
      GithubArtifacts.listArtifacts(new FakeTransport(Nil), "owner/repo",
        tokenPresent = false)
    }
  }

  test("fetch path: name/expired filter, 410 skip, cache write") {
    val entries = Seq(
      entry(1),
      entry(2, expired = true), // skipped: expired in the listing
      entry(3, name = "coverage-report"), // skipped: not a run archive
      entry(4, name = "my-opentelemetry-outputs-v1-main"), // substring match
      entry(5), // 410s on download: skipped, not fatal
      entry(6))
    val t = new FakeTransport(entries, gone = Set("5"))
    val cache = Files.createTempDirectory("graft-gh-cache")
    val zips = GithubArtifacts.artifactZips(
      t, Some("owner/repo"), Some(cache)).toSeq
    assert(zips.map(new String(_, "UTF-8")) ==
      Seq("zip-1", "zip-4", "zip-6"))
    // expired / name-filtered entries are never even downloaded
    assert(t.downloads.toSeq == Seq("1", "4", "5", "6"))
    assert(cache.toFile.list().sorted.toSeq ==
      Seq("1.zip", "4.zip", "6.zip"))
  }

  test("cache-only path and the no-source error") {
    val cache = Files.createTempDirectory("graft-gh-cache2")
    Files.write(cache.resolve("a.zip"), "za".getBytes)
    Files.write(cache.resolve("b.zip"), "zb".getBytes)
    Files.write(cache.resolve("notes.txt"), "x".getBytes)
    val got = GithubArtifacts.artifactZips(
      new FakeTransport(Nil), None, Some(cache))
      .map(new String(_, "UTF-8")).toSeq.sorted
    assert(got == Seq("za", "zb"))
    intercept[IllegalArgumentException] {
      GithubArtifacts.artifactZips(new FakeTransport(Nil), None, None)
    }
  }

  test("readRepo: fetched artifacts parse into a span DataFrame") {
    import SpanFixtures._
    val spans = Seq(
      span("execute-task", "0xgh1", None, attrs = Map("task.id" -> "t1")),
      span("named-value", "0xgh2", Some("0xgh1")))
    val json = "[" + spans.map(graft.exec.SpanJson.render).mkString(",") + "]"
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("opentelemetry-spans.json"))
    zos.write(json.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val zipBytes = bos.toByteArray
    val t = new FakeTransport(Seq(entry(42))) {
      override def download(repo: String, artifactId: String) = Some(zipBytes)
    }
    val cache = Files.createTempDirectory("graft-gh-cache3")
    val df = GithubArtifacts.readRepo(spark, t, "owner/repo", cache)
    assert(df.count() == 2)
    assert(df.where(org.apache.spark.sql.functions.col("name") === "execute-task")
      .count() == 1)
  }
}
