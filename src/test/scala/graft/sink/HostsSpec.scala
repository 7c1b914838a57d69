package graft.sink

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Hosts-file loading — mirrors the reference's three hostfile test
 *  cases (tests/test_hostfile.py) plus the poster wiring. */
class HostsSpec extends AnyFunSuite {

  test("parses an existing yaml hosts file") {
    val dir = Files.createTempDirectory("graft-hosts")
    val f = dir.resolve("fhir_hosts")
    Files.write(f,
      ("dev:\n" +
        "  host_desc: Dev\n" +
        "  target_service_url: http://example.org/fhir\n" +
        "  auth_type: auth_basic\n").getBytes(StandardCharsets.UTF_8))
    val config = Hosts.load(f.toString, exampleOut = _ => ())
    assert(config.keySet == Set("dev"))
    val dev = config("dev")
    assert(dev.hostDesc == "Dev")
    assert(dev.targetServiceUrl == "http://example.org/fhir")
    assert(dev.authType == "auth_basic")
  }

  test("host entries keep the file's declaration order") {
    val dir = Files.createTempDirectory("graft-hosts")
    val f = dir.resolve("fhir_hosts")
    // deliberately anti-alphabetical: insertion order must survive
    Files.write(f,
      ("zeta:\n  target_service_url: http://z\n  auth_type: none\n" +
        "alpha:\n  target_service_url: http://a\n  auth_type: none\n" +
        "mid:\n  target_service_url: http://m\n  auth_type: none\n")
        .getBytes(StandardCharsets.UTF_8))
    val config = Hosts.load(f.toString, exampleOut = _ => ())
    assert(config.keys.toSeq == Seq("zeta", "alpha", "mid"))
  }

  test("missing file writes example config and hard-errors") {
    val missing = Files.createTempDirectory("graft-hosts").resolve("does-not-exist")
    val out = new StringBuilder
    val err = new java.io.ByteArrayOutputStream()
    val ex = Console.withErr(err) {
      intercept[Hosts.HostsFileMissing](Hosts.load(missing.toString, out.append(_)))
    }
    assert(ex.getMessage.contains("must exist in cwd"))
    assert(out.toString.contains("Example Hosts Configuration"))
    assert(err.toString(StandardCharsets.UTF_8).contains("must exist in cwd"))
  }

  test("empty file is treated as missing") {
    val dir = Files.createTempDirectory("graft-hosts")
    val f = dir.resolve("fhir_hosts")
    Files.write(f, Array.empty[Byte])
    val err = new java.io.ByteArrayOutputStream()
    Console.withErr(err) {
      intercept[Hosts.HostsFileMissing](Hosts.load(f.toString, _ => ()))
    }
  }

  test("the example config itself parses and round-trips both auth types") {
    val dir = Files.createTempDirectory("graft-hosts")
    val f = dir.resolve("fhir_hosts")
    Files.write(f, Hosts.exampleConfig.getBytes(StandardCharsets.UTF_8))
    val config = Hosts.load(f.toString, _ => ())
    assert(config.keySet == Set("example_basic", "example_bearer"))
    val basic = config("example_basic").authHeaders("Authorization")
    assert(basic == "Basic " + java.util.Base64.getEncoder
      .encodeToString("user:secret".getBytes(StandardCharsets.UTF_8)))
    assert(config("example_bearer").authHeaders("Authorization") == "Bearer replace-with-token")
  }

  test("poster built from a host posts with its auth header") {
    // local loopback server records the Authorization header
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var seenAuth: String = null
    server.createContext("/fhir", { exchange =>
      seenAuth = exchange.getRequestHeaders.getFirst("Authorization")
      val body = """{"id":"srv-1"}""".getBytes(StandardCharsets.UTF_8)
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val host = Hosts.HostConfig("dev", "Dev",
        s"http://127.0.0.1:${server.getAddress.getPort}/fhir",
        "auth_bearer", Map("token" -> "t0k"))
      val id = host.poster(maxRetries = 1).post("POST", "Patient", null, """{"a":1}""")
      assert(id == "srv-1")
      assert(seenAuth == "Bearer t0k")
    } finally server.stop(0)
  }
}
