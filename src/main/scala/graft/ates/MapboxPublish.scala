package graft.ates

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** O4 — Mapbox tileset upload orchestration, engine-side.
  *
  * The reference drives this from a shell loop
  * (`/root/reference/run_mapboxing.bash:13-70`): for each exported
  * GeoJSON-LD file, POST it as a tileset source (multipart, source name =
  * file name minus extension) and GET it back as a check; then build the
  * recipe over the collected source ids (`make-recipe.js`, implemented as
  * [[graft.sinks.Sinks.recipeJson]]), POST the tileset with the recipe
  * body, and POST its publish endpoint.
  *
  * Here the same orchestration is a deterministic REQUEST PLAN (pure data,
  * inspectable and testable) plus an executor over a pluggable transport.
  * The default transport is the JDK `HttpClient`; the spec runs the full
  * sequence against an in-process `com.sun.net.httpserver` stand-in — the
  * build never calls the real API (zero egress), which is exactly the
  * reference's own `TESTING` guard (`run_mapboxing.bash:35`), made typed.
  */
object MapboxPublish {

  /** One planned HTTP call. `filePart` is a multipart file upload (the
    * source POST); `body` an inline JSON payload (recipe/tileset). */
  final case class Request(
      step: String,
      method: String,
      url: String,
      contentType: Option[String] = None,
      filePart: Option[Path] = None,
      body: Option[String] = None)

  final case class Response(status: Int, body: String)

  /** A step outcome: the planned request plus what the transport said. */
  final case class Outcome(request: Request, response: Response) {
    def ok: Boolean = response.status >= 200 && response.status < 300
  }

  /** The deterministic request sequence for publishing `sourceDir`'s
    * GeoJSON-LD exports as tileset `user.tilesetName`:
    * upload+check per file (sorted, mirroring the shell `ls` loop), then
    * create-tileset with the recipe over the derived source ids, then
    * publish. The access token rides as a query parameter exactly as the
    * reference passes it (`?access_token=`). */
  def plan(sourceDir: Path, user: String, tilesetName: String, token: String,
      apiBase: String = "https://api.mapbox.com"): Seq[Request] = {
    val listing = Files.list(sourceDir)
    val files =
      try listing.iterator().asScala
        .filter(Files.isRegularFile(_))
        // hidden files (.DS_Store, editor swap) would derive an EMPTY
        // source name and hit the list-sources endpoint instead
        .filterNot(_.getFileName.toString.startsWith("."))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    require(files.nonEmpty, s"no source files under $sourceDir")
    // first dot-segment, matching the reference's `IFS='.' read` naming
    val sources = files.map(f => f.getFileName.toString.split('.').head -> f)
    val dupNames = sources.groupBy(_._1).filter(_._2.length > 1).keys
    require(dupNames.isEmpty,
      s"source files collide on derived names: ${dupNames.mkString(", ")} " +
        "(two uploads would append to one tileset source and the recipe " +
        "would emit duplicate layer keys)")
    val perSource = sources.flatMap { case (name, path) =>
      Seq(
        Request(s"upload:$name", "POST",
          s"$apiBase/tilesets/v1/sources/$user/$name?access_token=$token",
          contentType = Some("multipart/form-data"), filePart = Some(path)),
        Request(s"check:$name", "GET",
          s"$apiBase/tilesets/v1/sources/$user/$name?access_token=$token"))
    }
    val tilesetId = s"$user.$tilesetName"
    val recipe = graft.sinks.Sinks.recipeJson(
      sources.map(_._1), user, tilesetName, wrap = true)
    perSource ++ Seq(
      Request("create-tileset", "POST",
        s"$apiBase/tilesets/v1/$tilesetId?access_token=$token",
        contentType = Some("application/json"), body = Some(recipe)),
      Request("publish", "POST",
        s"$apiBase/tilesets/v1/$tilesetId/publish?access_token=$token"))
  }

  /** Execute a plan in order through `transport`, stopping at the first
    * non-2xx response (the shell loop barrels on; a typed orchestrator
    * should not publish a tileset whose sources failed to land). A
    * transport exception (connection reset mid-sequence) records as a
    * synthetic 599 outcome rather than escaping — the caller always gets
    * the outcomes of the steps that DID land, or retry decisions are
    * impossible. */
  def run(requests: Seq[Request],
      transport: Request => Response): Seq[Outcome] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Outcome]
    val it = requests.iterator
    var halted = false
    while (it.hasNext && !halted) {
      val req = it.next()
      val resp =
        try transport(req)
        catch { case scala.util.control.NonFatal(e) =>
          Response(599, s"transport error: ${e.getClass.getName}: ${e.getMessage}")
        }
      val o = Outcome(req, resp)
      out += o
      halted = !o.ok
    }
    out.toSeq
  }

  /** JDK-HttpClient transport. Multipart uploads send the file as one
    * `file` part (the reference's `curl -F file=@…`). */
  def httpTransport(
      client: java.net.http.HttpClient =
        java.net.http.HttpClient.newHttpClient()): Request => Response = {
    req =>
      val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
      val withBody = (req.filePart, req.body) match {
        case (Some(path), _) =>
          val boundary = "graftb" + java.util.UUID.randomUUID().toString
          val head = (s"--$boundary\r\n" +
            s"""Content-Disposition: form-data; name="file"; filename="${path.getFileName}"\r\n""" +
            "Content-Type: application/octet-stream\r\n\r\n")
            .getBytes(StandardCharsets.UTF_8)
          val tail = s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.UTF_8)
          // concat streams the file part with constant memory — a multi-GB
          // tileset source must not be buffered (×3) on the driver
          import java.net.http.HttpRequest.BodyPublishers
          builder.header("Content-Type", s"multipart/form-data; boundary=$boundary")
            .method(req.method, BodyPublishers.concat(
              BodyPublishers.ofByteArray(head),
              BodyPublishers.ofFile(path),
              BodyPublishers.ofByteArray(tail)))
        case (None, Some(b)) =>
          req.contentType.foreach(ct => builder.header("Content-Type", ct))
          builder.method(req.method,
            java.net.http.HttpRequest.BodyPublishers.ofString(b))
        case (None, None) =>
          builder.method(req.method,
            java.net.http.HttpRequest.BodyPublishers.noBody())
      }
      val resp = client.send(withBody.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      Response(resp.statusCode(), resp.body())
  }
}
