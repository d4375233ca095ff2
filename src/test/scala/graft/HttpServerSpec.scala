package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.ates.{Fixtures, KmzHttpServer}

/** In-process drive of the S9 HTTP surface (FGU:976-1009 behavior). */
class HttpServerSpec extends SparkSpec {

  test("GET /:lang/:areaId.kmz serves a KMZ attachment; routes validate") {
    val srv = new KmzHttpServer(spark, Fixtures.tables(spark), port = 0)
    val port = srv.start()
    val client = HttpClient.newHttpClient()
    def get(path: String) = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    try {
      val ok = get("/en/357.kmz")
      assert(ok.statusCode() == 200)
      assert(ok.headers().firstValue("Content-Disposition").get ==
        "attachment; filename=357.kmz")
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(ok.body()))
      val entry = zin.getNextEntry
      assert(entry.getName == "doc.kml")
      val kml = new String(zin.readAllBytes(), "UTF-8")
      assert(kml.contains("<name>Test Area</name>"))

      // invalid lang falls back to en (returnIfIn, FGU:963)
      val fallback = get("/zz/357.kmz")
      assert(fallback.statusCode() == 200)

      // help root (FGU:985) and 404 on malformed ids
      assert(new String(get("/").body(), "UTF-8") == "help")
      assert(get("/en/notanumber.kmz").statusCode() == 404)
    } finally srv.stop()
  }
}
