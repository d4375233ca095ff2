package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite
import graft.ates.MapboxPublish
import graft.ates.MapboxPublish.{Request, Response}

/** O4 end to end with zero egress: the full upload→check→create→publish
  * sequence executes over the real JDK HttpClient against an in-process
  * API stand-in on localhost. */
class MapboxPublishSpec extends AnyFunSuite {

  private def withSourceDir[A](f: java.nio.file.Path => A): A = {
    val dir = Files.createTempDirectory("mbx_src")
    try {
      Files.write(dir.resolve("avalanche_paths.geojsonld"),
        """{"type":"Feature","properties":{"table":"avalanche_paths"}}"""
          .getBytes(StandardCharsets.UTF_8))
      Files.write(dir.resolve("decision_points.geojsonld"),
        """{"type":"Feature","properties":{"table":"decision_points"}}"""
          .getBytes(StandardCharsets.UTF_8))
      f(dir)
    } finally {
      Files.list(dir).forEach(p => Files.delete(p)); Files.delete(dir)
    }
  }

  test("plan: sorted upload+check per source, then create with recipe, then publish") {
    withSourceDir { dir =>
      val plan = MapboxPublish.plan(dir, "someuser", "ates", "tok123")
      assert(plan.map(_.step) == Seq(
        "upload:avalanche_paths", "check:avalanche_paths",
        "upload:decision_points", "check:decision_points",
        "create-tileset", "publish"))
      assert(plan.forall(_.url.contains("access_token=tok123")))
      val upload = plan.head
      assert(upload.method == "POST" &&
        upload.url.startsWith(
          "https://api.mapbox.com/tilesets/v1/sources/someuser/avalanche_paths"))
      val create = plan(4)
      assert(create.url.contains("/tilesets/v1/someuser.ates?"))
      val recipe = create.body.get
      assert(recipe.contains("mapbox://tileset-source/someuser/avalanche_paths")
        && recipe.contains("mapbox://tileset-source/someuser/decision_points"))
      assert(plan.last.url.contains("/tilesets/v1/someuser.ates/publish"))
    }
  }

  test("run halts at the first failed step (no publish over broken sources)") {
    withSourceDir { dir =>
      val plan = MapboxPublish.plan(dir, "u", "t", "tok")
      val outcomes = MapboxPublish.run(plan, req =>
        if (req.step == "check:avalanche_paths") Response(500, "boom")
        else Response(200, "ok"))
      assert(outcomes.map(_.request.step) ==
        Seq("upload:avalanche_paths", "check:avalanche_paths"))
      assert(!outcomes.last.ok)
    }
  }

  test("full sequence over the JDK HttpClient against a local API stand-in") {
    withSourceDir { dir =>
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      val server = HttpServer.create(new InetSocketAddress(0), 0)
      server.createContext("/", { exchange =>
        val body = new String(exchange.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        seen.synchronized {
          seen += ((exchange.getRequestMethod,
            exchange.getRequestURI.toString, body))
        }
        val resp = """{"id":"ok"}""".getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(200, resp.length)
        exchange.getResponseBody.write(resp)
        exchange.close()
      })
      server.start()
      try {
        val base = s"http://localhost:${server.getAddress.getPort}"
        val plan = MapboxPublish.plan(dir, "u", "ates", "tok", apiBase = base)
        val outcomes = MapboxPublish.run(plan, MapboxPublish.httpTransport())
        assert(outcomes.length == 6 && outcomes.forall(_.ok))
        // the multipart upload carried the file content and its filename
        val (m0, u0, b0) = seen.head
        assert(m0 == "POST" && u0.contains("/sources/u/avalanche_paths"))
        assert(b0.contains("""filename="avalanche_paths.geojsonld"""") &&
          b0.contains(""""table":"avalanche_paths""""))
        // the tileset create delivered the recipe JSON inline
        val (_, uc, bc) = seen(4)
        assert(uc.contains("/tilesets/v1/u.ates?") &&
          bc.contains("mapbox://tileset-source/u/avalanche_paths"))
        assert(seen(5)._2.contains("/tilesets/v1/u.ates/publish"))
      } finally server.stop(0)
    }
  }
}
