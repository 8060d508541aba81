package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

class PathGuardSpec extends AnyFunSuite {
  private val base = Files.createTempDirectory("guard")
  Files.writeString(base.resolve("ok.csv"), "x")

  test("valid file resolves") {
    assert(PathGuard.validatedFilePath(base, "ok.csv").getFileName.toString === "ok.csv")
  }
  test("traversal raises Invalid filename (reference path_utils.py:15-17)") {
    val e = intercept[IllegalArgumentException](
      PathGuard.validatedFilePath(base, "../etc/passwd"))
    assert(e.getMessage === "Invalid filename")
  }
  test("missing file raises File not found") {
    val e = intercept[java.io.FileNotFoundException](
      PathGuard.validatedFilePath(base, "nope.csv"))
    assert(e.getMessage === "File not found")
  }
}

class CharsetFallbackSpec extends AnyFunSuite {
  test("valid UTF-8 decodes as UTF-8") {
    val (s, cs) = CharsetFallback.decode("привет".getBytes(StandardCharsets.UTF_8))
    assert(s === "привет" && cs === "UTF-8")
  }
  test("cp1251 bytes fall through to windows-1251") {
    val bytes = "Диван".getBytes("windows-1251")
    val (s, cs) = CharsetFallback.decode(bytes)
    assert(cs === "windows-1251" && s === "Диван")
  }
  test("arbitrary binary decodes via the latin-1 net (like the reference chain)") {
    val (_, cs) = CharsetFallback.decode(Array[Byte](0x41, 0x42))
    assert(cs === "UTF-8") // plain ASCII is valid UTF-8
  }
}

class CsvSniffSpec extends AnyFunSuite {
  test("a UTF-8 file larger than the sniff head with a multibyte char cut " +
       "at the boundary still sniffs as UTF-8") {
    // 64KB head: fill with "яя…" so byte 65535 lands mid-character (each
    // 'я' is 2 UTF-8 bytes; an odd-length ASCII prefix shifts the grid)
    val sb = new StringBuilder("id;яname\n")
    while (sb.length < 70000) sb.append('я')
    val tmp = java.nio.file.Files.createTempFile("graft_sniff", ".csv")
    try {
      java.nio.file.Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
      val (sep, cs) = CsvSource.sniffFileWithCharset(tmp.toString)
      assert(cs === "UTF-8", "truncated multibyte tail must not fail the probe")
      assert(sep === ";")
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("dropTruncatedUtf8Tail keeps complete sequences, drops partial ones") {
    val complete = "abя".getBytes(StandardCharsets.UTF_8)
    assert(CsvSource.dropTruncatedUtf8Tail(complete).toSeq === complete.toSeq)
    val partial = complete.dropRight(1) // lead byte of я without its tail
    assert(CsvSource.dropTruncatedUtf8Tail(partial).toSeq ===
      "ab".getBytes(StandardCharsets.UTF_8).toSeq)
  }
}

class HttpFetchSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      server.createContext(path, (ex: HttpExchange) => h(ex))
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      cType: String = "application/xml"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", cType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fast path: 200 with XML body returns immediately") {
    withServer(Map("/feed.xml" -> (ex =>
      respond(ex, 200, "<?xml version=\"1.0\"?><yml_catalog><offer/></yml_catalog>")))) { base =>
      val body = HttpFetch.fetch(s"$base/feed.xml", sleepMillis = 0)
      assert(body.contains("<yml_catalog>"))
    }
  }

  test("strategy retry: UA-gated server yields to a later strategy") {
    withServer(Map("/gated.xml" -> (ex => {
      val ua = Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
      if (ua.contains("iPhone"))
        respond(ex, 200, "<?xml version=\"1.0\"?><yml_catalog/>")
      else respond(ex, 403, "denied", "text/html")
    }))) { base =>
      val body = HttpFetch.fetch(s"$base/gated.xml", sleepMillis = 0)
      assert(body.startsWith("<?xml"))
    }
  }

  test("non-XML content is rejected with the blocked-access error") {
    withServer(Map("/page" -> (ex =>
      respond(ex, 200, "<html><body>hi</body></html>", "text/html")))) { base =>
      intercept[IllegalArgumentException](
        HttpFetch.fetch(s"$base/page", sleepMillis = 0))
    }
  }

  test("looksLikeXml accepts only xml/yml heads") {
    assert(HttpFetch.looksLikeXml("  <?xml version='1.0'?><a/>"))
    assert(HttpFetch.looksLikeXml("<yml_catalog date='x'>"))
    assert(!HttpFetch.looksLikeXml("<html>"))
  }
}
