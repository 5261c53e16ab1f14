package graft.spans

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** F1 — GitHub Actions artifact source: the reference's fetch-side logic
  * (`otel_output_parser/common_helpers/github_helpers.py:15-164`) with the
  * HTTP client abstracted behind [[GithubArtifacts.Transport]] (this
  * environment has no egress; the pagination / filtering / caching /
  * expiry-tolerance logic is pure and portable).
  *
  * The reference's behaviors preserved:
  *  - page iteration from 1 until the first empty page, then an assertion
  *    that the accumulated entry count equals the API's `total_count`;
  *  - repo format validation (`owner/repo-name`) and token presence;
  *  - skip entries that are `expired` or whose name lacks
  *    `opentelemetry-outputs-v1`;
  *  - HTTP 410 during download (expired between list and fetch) skips the
  *    artifact rather than failing the run;
  *  - optional zip cache directory: fetched artifacts are written as
  *    `<id>.zip`; with no repo configured the cache directory IS the
  *    source.
  */
object GithubArtifacts {

  /** One artifact list entry (the subset of the GitHub API response the
    * pipeline consumes). */
  case class ArtifactEntry(id: String, name: String, expired: Boolean)

  case class PageResult(artifacts: Seq[ArtifactEntry], totalCount: Long)

  /** Transport seam. `download` returns None for HTTP 410 (gone) and
    * throws on any other failure, mirroring the reference's
    * `download_artifact`. */
  trait Transport {
    def listPage(repo: String, perPage: Int, page: Int): PageResult
    def download(repo: String, artifactId: String): Option[Array[Byte]]
  }

  /** Parse a GitHub artifact-list response body into a [[PageResult]] —
    * pure, so the field mapping is unit-testable offline. Shape per the
    * REST API the reference paginates (`github_helpers.py:15-39`):
    * `{"total_count": N, "artifacts": [{"id":…, "name":…, "expired":…}]}`.
    * Ids arrive as JSON numbers but travel as strings here (the pipeline
    * only ever interpolates them into URLs and cache filenames). */
  private[graft] def parseListPage(body: String): PageResult = {
    val obj = graft.model.Json.parse(body) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => throw new IllegalStateException(
        s"artifact list response is not a JSON object: ${other.getClass.getSimpleName}")
    }
    def asLong(v: Any, field: String): Long = v match {
      case l: Long => l
      case d: Double if d.isWhole => d.toLong
      case other => throw new IllegalStateException(
        s"artifact list field $field is not an integer: $other")
    }
    val total = asLong(obj.getOrElse("total_count",
      throw new IllegalStateException("artifact list response has no total_count")),
      "total_count")
    val entries = obj.getOrElse("artifacts", Vector.empty) match {
      case v: Vector[_] => v.map {
        case e: Map[_, _] =>
          val m = e.asInstanceOf[Map[String, Any]]
          ArtifactEntry(
            id = asLong(m.getOrElse("id",
              throw new IllegalStateException("artifact entry has no id")), "id").toString,
            name = m.getOrElse("name", "").asInstanceOf[String],
            expired = m.getOrElse("expired", false) == true)
        case other => throw new IllegalStateException(
          s"artifact entry is not an object: $other")
      }
      case other => throw new IllegalStateException(
        s"artifacts field is not an array: $other")
    }
    PageResult(entries, total)
  }

  /** Live REST transport over the JDK's `java.net.http` — no new
    * dependency, and CONSTRUCTION does no I/O, so it is safe to
    * instantiate in an offline environment (first use fails instead).
    * Request shapes mirror the reference (`github_helpers.py:75-105`):
    * list = `GET {base}/repos/{repo}/actions/artifacts?per_page&page`;
    * download = `GET …/artifacts/{id}/zip`, whose 302 to the blob store
    * is followed MANUALLY and WITHOUT the Authorization header —
    * `java.net.http.HttpClient` re-sends all user headers across
    * cross-origin redirects (unlike python requests, which strips auth
    * on host change, the behavior the reference silently relies on), and
    * the SAS-signed blob URL rejects requests that also carry a bearer
    * token. 410 → None (expired between list and fetch); any other
    * non-200 is a hard error. Contract tests stay on the fake transport;
    * this class only adds the wire layer. */
  final class HttpTransport(
      token: String,
      apiBase: String = "https://api.github.com",
      requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(60))
      extends Transport {
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    private lazy val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NEVER) // redirects handled below
      .connectTimeout(requestTimeout)
      .build()
    private def get(uri: String, auth: Boolean): HttpRequest = {
      val b = HttpRequest.newBuilder(java.net.URI.create(uri))
        .timeout(requestTimeout)
        .header("Accept", "application/vnd.github+json")
        .GET()
      if (auth) b.header("Authorization", s"Bearer $token")
        .header("X-GitHub-Api-Version", "2022-11-28")
      b.build()
    }

    def listPage(repo: String, perPage: Int, page: Int): PageResult = {
      val resp = client.send(
        get(s"$apiBase/repos/$repo/actions/artifacts?per_page=$perPage&page=$page",
          auth = true),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        throw new IllegalStateException(
          s"GitHub artifact list failed: HTTP ${resp.statusCode()} for $repo page $page")
      parseListPage(resp.body())
    }

    def download(repo: String, artifactId: String): Option[Array[Byte]] = {
      var uri = s"$apiBase/repos/$repo/actions/artifacts/$artifactId/zip"
      var auth = true // only the api.github.com hop is authenticated
      var hops = 0
      while (hops < 5) {
        val resp = client.send(get(uri, auth),
          HttpResponse.BodyHandlers.ofByteArray())
        resp.statusCode() match {
          case 200 => return Some(resp.body())
          case 410 => return None // expired after list (github_helpers.py:98-105)
          case 301 | 302 | 303 | 307 | 308 =>
            val location = resp.headers().firstValue("location").orElseThrow(() =>
              new IllegalStateException(
                s"redirect without Location for $repo artifact $artifactId"))
            // python requests (the reference's client) strips Authorization
            // only when the ORIGIN changes (`Session.should_strip_auth`:
            // hostname or port differ); a same-origin hop (e.g. a renamed
            // repo's 301 on api.github.com) must stay authenticated or the
            // retry 401s. Cross-origin (the blob-store 302) drops auth —
            // JDK HttpClient would re-send it, which is why redirects are
            // followed manually here.
            val target = java.net.URI.create(uri).resolve(location)
            auth = auth && sameOrigin(target, java.net.URI.create(apiBase))
            uri = target.toString
            hops += 1
          case c => throw new IllegalStateException(
            s"GitHub artifact download failed: HTTP $c for $repo artifact $artifactId")
        }
      }
      throw new IllegalStateException(
        s"too many redirects downloading $repo artifact $artifactId")
    }

    private def sameOrigin(a: java.net.URI, b: java.net.URI): Boolean = {
      def port(u: java.net.URI): Int =
        if (u.getPort != -1) u.getPort
        else if (u.getScheme == "https") 443
        else 80
      a.getScheme == b.getScheme && a.getHost == b.getHost && port(a) == port(b)
    }
  }

  /** Repo/token validation (`github_helpers.py:42-49`). */
  def validateRepoSetup(repo: String, tokenPresent: Boolean): Unit = {
    if (repo.split("/", -1).length != 2)
      throw new IllegalArgumentException(
        "github_repository parameter should be in format owner/repo-name")
    if (!tokenPresent)
      throw new IllegalStateException("GITHUB_TOKEN should be set")
  }

  /** All artifact entries for a repo: pages from 1 until the first empty
    * page; the accumulated count must equal the last page's `total_count`
    * (`github_helpers.py:15-39` — the upstream paginator looped to a fixed
    * page bound; stopping on the first empty page is the documented
    * workaround, the count assertion catches a list that changed under
    * us). */
  def listArtifacts(
      t: Transport,
      repo: String,
      perPage: Int = 30,
      tokenPresent: Boolean = true): Seq[ArtifactEntry] = {
    validateRepoSetup(repo, tokenPresent)
    val out = Seq.newBuilder[ArtifactEntry]
    var count = 0L
    var page = 1
    var last: PageResult = null
    var done = false
    while (!done) {
      last = t.listPage(repo, perPage, page)
      // hard page ceiling from the server's own total_count: a transport
      // that repeats pages (proxy retry, pagination bug) must fail loudly
      // here instead of looping forever — the post-loop count assertion can
      // only fire once the loop EXITS. +1 page of slack tolerates entries
      // appended between pages.
      val maxPages = (last.totalCount + perPage - 1) / perPage + 1
      if (page > maxPages)
        throw new IllegalStateException(
          s"paginator overran page $page > ceil(total_count=${last.totalCount}/$perPage)+1 " +
            "— transport is repeating pages")
      if (last.artifacts.isEmpty) done = true
      else {
        out ++= last.artifacts
        count += last.artifacts.size
        page += 1
      }
    }
    if (count != last.totalCount)
      throw new IllegalStateException(
        s"paginator count $count != total_count ${last.totalCount}")
    out.result()
  }

  /** The run-archive name filter (`github_helpers.py:139`). */
  private[spans] def wanted(e: ArtifactEntry): Boolean =
    !e.expired && e.name.contains("opentelemetry-outputs-v1")

  /** Zip payloads per the reference's source contract
    * (`github_helpers.py:108-164`): repo set → fetch (and cache if a dir is
    * given); only cache dir set → read the cache; neither → error. */
  def artifactZips(
      t: Transport,
      repo: Option[String],
      zipCacheDir: Option[Path],
      tokenPresent: Boolean = true): Iterator[Array[Byte]] = (repo, zipCacheDir) match {
    case (Some(r), cache) =>
      listArtifacts(t, r, tokenPresent = tokenPresent).iterator
        .filter(wanted)
        .flatMap { e =>
          t.download(r, e.id) match {
            case None => None // 410: expired after the list was fetched
            case Some(bytes) =>
              cache.foreach { dir =>
                Files.createDirectories(dir)
                Files.write(dir.resolve(e.id + ".zip"), bytes)
              }
              Some(bytes)
          }
        }
    case (None, Some(dir)) =>
      // materialize the listing so the directory stream closes promptly (a
      // lazy iterator would leak the fd until GC on the polling use case)
      val stream = Files.list(dir)
      val paths = try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".zip")).toVector
      finally stream.close()
      paths.iterator.map(Files.readAllBytes)
    case (None, None) =>
      throw new IllegalArgumentException(
        "Both github_repository and zip_cache_dir can not be None")
  }

  /** Fetch a repo's run archives into `cacheDir`, then hand the directory
    * to the distributed zip reader — the driver moves only artifact BYTES
    * into the cache; span parsing stays on executors
    * ([[SpanSource.readZips]]). */
  def readRepo(
      spark: SparkSession,
      t: Transport,
      repo: String,
      cacheDir: Path,
      tokenPresent: Boolean = true): DataFrame = {
    // drain the iterator, counting: every zip lands in the cache dir
    val n = artifactZips(t, Some(repo), Some(cacheDir), tokenPresent).size
    if (n == 0) {
      // all artifacts expired / filtered / 410'd: an empty span frame, not
      // a path-does-not-exist crash from a glob over an empty cache
      import org.apache.spark.sql.functions.lit
      graft.model.SpanModel.toDF(spark, Seq.empty)
        .select(lit(null).cast("string").as("source_zip"),
          org.apache.spark.sql.functions.col("*"))
    } else SpanSource.readZips(spark, cacheDir.toString + "/*.zip")
  }
}
