package graft.jobhistory

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import javax.imageio.ImageIO

import graft.SparkSpec

/** The HTTP serving surface (job_history.cgi:52-100 parity): `url=` /
  * `log=` via GET query or POST form body → the stacked chart PNG. */
class HttpServeSpec extends SparkSpec {

  private def withServer[A](f: (HttpClient, Int) => A): A = {
    val server = HttpServe.start(spark, 0)
    try f(HttpClient.newHttpClient(), server.getAddress.getPort)
    finally server.stop(0)
  }

  test("POST log= answers with the CGI-scale chart PNG") {
    withServer { (client, port) =>
      val log = Files.readString(Paths.get(Fixtures.pig))
      val body = "log=" + java.net.URLEncoder.encode(log, "UTF-8")
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(body))
          .build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() === 200)
      assert(resp.headers().firstValue("Content-Type").get() === "image/png")
      val img = ImageIO.read(new java.io.ByteArrayInputStream(resp.body()))
      assert(img.getWidth === 1200 && img.getHeight === 800)
      // byte-identical to rendering the batch timeline at the CGI's
      // scale 100 directly — the endpoint is a pure wrapper
      val direct = new java.io.ByteArrayOutputStream()
      ChartSink.writePng(
        Reports.timeline(JobHistoryViews.fromFile(spark, Fixtures.pig, 100L)),
        direct, "", ChartSink.Width, ChartSink.Height)
      assert(resp.body().sameElements(direct.toByteArray))
    }
  }

  test("GET url= (file URL) serves the same chart; missing params are a 400") {
    withServer { (client, port) =>
      val fileUrl = Paths.get(Fixtures.pig).toUri.toString
      val ok = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/?url=" +
          java.net.URLEncoder.encode(fileUrl, "UTF-8"))).GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(ok.statusCode() === 200)
      assert(ok.headers().firstValue("Content-Type").get() === "image/png")
      assert(ImageIO.read(new java.io.ByteArrayInputStream(ok.body())) != null)

      val bad = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() === 400)
      assert(bad.body().contains("url= or log="))
    }
  }

  test("scale= parameter widens the chart's time units (extension)") {
    withServer { (client, port) =>
      val log = Files.readString(Paths.get(Fixtures.pig))
      def fetch(extra: String): Array[Byte] = {
        val body = "log=" + java.net.URLEncoder.encode(log, "UTF-8") + extra
        client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
            .header("Content-Type", "application/x-www-form-urlencoded")
            .POST(HttpRequest.BodyPublishers.ofString(body))
            .build(),
          HttpResponse.BodyHandlers.ofByteArray()).body()
      }
      val coarse = fetch("&scale=10000")
      val direct = new java.io.ByteArrayOutputStream()
      ChartSink.writePng(
        Reports.timeline(JobHistoryViews.fromFile(spark, Fixtures.pig, 10000L)),
        direct, "", ChartSink.Width, ChartSink.Height)
      assert(coarse.sameElements(direct.toByteArray))
    }
  }
}
