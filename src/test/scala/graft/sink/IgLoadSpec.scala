package graft.sink

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** JVM-singleton recorder: task closures get serialized copies of
 *  captured state even in local mode, so the shared log must live in a
 *  static object. */
object IgLoadRecorder {
  val ops = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
  def clear(): Unit = ops.clear()
  def seq: Seq[(String, String, String)] = {
    import scala.jdk.CollectionConverters._
    ops.asScala.toSeq
  }
}

class RecordingIgClient(deleteHits: Boolean) extends IgLoad.Client {
  override def delete(rt: String, url: Option[String], id: Option[String]): Boolean = {
    IgLoadRecorder.ops.add(("delete", rt, url.orElse(id).getOrElse("")))
    deleteHits
  }
  override def load(rt: String, url: Option[String], json: String, force: Boolean): Int = {
    IgLoadRecorder.ops.add(("load", rt, url.getOrElse("")))
    200
  }
}

class IgLoadSpec extends AnyFunSuite {
  import TestSpark.spark

  private def igZip(dir: Path): Path = {
    val igDir = dir.resolve("ig/output")
    Files.createDirectories(igDir)
    val zip = igDir.resolve("definitions.json.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    def add(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    add("CodeSystem-cs1.json",
      """{"resourceType":"CodeSystem","id":"cs1","url":"http://x/cs1"}""")
    add("ValueSet-vs1.json",
      """{"resourceType":"ValueSet","id":"vs1","url":"http://x/vs1"}""")
    add("CodeSystem-example-skip.json",
      """{"resourceType":"CodeSystem","id":"ex1","url":"http://x/ex1"}""")
    add("StructureDefinition-sd1.json",
      """{"resourceType":"StructureDefinition","id":"sd1","url":"http://x/sd1"}""")
    add("ImplementationGuide-ig.json",
      """{"resourceType":"ImplementationGuide","id":"ig","url":"http://x/ig"}""")
    add("spec.internals", "not json") // publisher metadata, not a resource
    zos.close()
    zip
  }

  test("parseContent: IG + FILES entries, list and whitespace-string forms") {
    val contents = IgLoad.parseContent(
      """MY-IG:
        |  source_type: IG
        |  url: https://example.org/ig
        |  resources:
        |  - CodeSystem
        |  - ValueSet
        |  exclude-wildcards:
        |  - example
        |EXTRA:
        |  source_type: FILES
        |  resources: http://x/a.json http://x/b.json
        |""".stripMargin)
    assert(contents.map(_.name) == Seq("MY-IG", "EXTRA"))
    assert(contents.head.url.contains("https://example.org/ig"))
    assert(contents.head.resources == Seq("CodeSystem", "ValueSet"))
    assert(contents.head.excludeWildcards == Seq("example"))
    assert(contents(1).resources == Seq("http://x/a.json", "http://x/b.json"))
  }

  test("force-overwrite: deletes before loads, IG last in both phases, exclusions skip") {
    val dir = Files.createTempDirectory("graft-igload")
    igZip(dir)
    val resources = graft.sources.BundleScan.readIgZip(
      spark, dir.resolve("ig/output/definitions.json.zip").toString)
    IgLoadRecorder.clear()
    val results = IgLoad.run(resources,
      resourceList = Seq("CodeSystem", "ValueSet", "ImplementationGuide"),
      exclusions = Seq("example"),
      forceOverwrite = true,
      makeClient = () => new RecordingIgClient(deleteHits = true),
      settleBaseMillis = 0L, settleMillisPerItem = 0L)
    val byAction = results.collect()
      .groupBy(_.getString(2)).view.mapValues(_.map(_.getString(0)).toSet).toMap
    // StructureDefinition not in the list; example matches the wildcard
    // (spec.internals never enters the scan — readIgZip keeps .json only)
    assert(byAction("excluded") ==
      Set("CodeSystem-example-skip.json", "StructureDefinition-sd1.json"))
    assert(byAction("loaded") ==
      Set("CodeSystem-cs1.json", "ValueSet-vs1.json", "ImplementationGuide-ig.json"))
    assert(byAction("deleted") == byAction("loaded"))

    val ops = IgLoadRecorder.seq
    // hard phase barrier: every delete precedes every load
    val lastDelete = ops.lastIndexWhere(_._1 == "delete")
    val firstLoad = ops.indexWhere(_._1 == "load")
    assert(lastDelete < firstLoad)
    // IG goes last within each phase
    assert(ops.filter(_._1 == "delete").last._2 == "ImplementationGuide")
    assert(ops.filter(_._1 == "load").last._2 == "ImplementationGuide")
    // deletes go by canonical url, not id (igload:30-31)
    assert(ops.filter(_._1 == "delete").forall(_._3.startsWith("http://x/")))
  }

  test("plain load: no deletes, everything in scope loads once") {
    val dir = Files.createTempDirectory("graft-igload2")
    igZip(dir)
    val resources = graft.sources.BundleScan.readIgZip(
      spark, dir.resolve("ig/output/definitions.json.zip").toString)
    IgLoadRecorder.clear()
    val results = IgLoad.run(resources,
      resourceList = Seq("CodeSystem", "ValueSet", "StructureDefinition", "ImplementationGuide"),
      exclusions = Nil, forceOverwrite = false,
      makeClient = () => new RecordingIgClient(deleteHits = false),
      settleBaseMillis = 0L, settleMillisPerItem = 0L)
    assert(results.filter(results("action") === "loaded").count() == 5)
    assert(IgLoadRecorder.seq.count(_._1 == "delete") == 0)
    assert(IgLoadRecorder.seq.count(_._1 == "load") == 5)
  }

  test("HttpIgClient: conditional delete/create/update against a loopback server") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()
    server.createContext("/fhir", { ex =>
      seen.add((ex.getRequestMethod, ex.getRequestURI.toString,
        Option(ex.getRequestHeaders.getFirst("If-None-Exist")).getOrElse("")))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val c = new HttpIgClient(s"http://127.0.0.1:${server.getAddress.getPort}/fhir")
      assert(c.delete("CodeSystem", Some("http://x/cs1"), Some("cs1")))
      assert(c.delete("CodeSystem", None, Some("cs1")))
      c.load("CodeSystem", Some("http://x/cs1"), "{}", forceOverwrite = false)
      c.load("CodeSystem", Some("http://x/cs1"), "{}", forceOverwrite = true)
      c.load("CodeSystem", None, "{}", forceOverwrite = false)
      import scala.jdk.CollectionConverters._
      val ops = seen.asScala.toSeq
      assert(ops(0)._1 == "DELETE" && ops(0)._2.contains("url=http%3A%2F%2Fx%2Fcs1"))
      assert(ops(1)._1 == "DELETE" && ops(1)._2.endsWith("/CodeSystem/cs1"))
      assert(ops(2)._1 == "POST" && ops(2)._3 == "url=http%3A%2F%2Fx%2Fcs1")
      assert(ops(3)._1 == "PUT" && ops(3)._2.contains("CodeSystem?url="))
      assert(ops(4)._1 == "POST" && ops(4)._3 == "")
    } finally server.stop(0)
  }

  test("settle pause is base + perItem x deleted, and only after force-overwrite deletes") {
    // ref igload/__init__.py:220: sleep(args.sleep_time + len(deleted_items))
    // — the CLI maps --sleep-time N to base N s with 1 s per deleted
    // resource. Pinned deterministically via the injected sleeper: the
    // assertion checks the COMPUTED pause millis, not wall time (the
    // wall-clock differencing form of this test was flaky on a noisy host)
    val dir = Files.createTempDirectory("graft-igload4")
    igZip(dir)
    val resources = graft.sources.BundleScan.readIgZip(
      spark, dir.resolve("ig/output/definitions.json.zip").toString)
    def sleeps(base: Long, perItem: Long, overwrite: Boolean): Seq[Long] = {
      IgLoadRecorder.clear()
      val requested = scala.collection.mutable.ArrayBuffer.empty[Long]
      IgLoad.run(resources,
        resourceList = Seq("CodeSystem", "ValueSet", "ImplementationGuide"),
        exclusions = Seq("example"), forceOverwrite = overwrite,
        makeClient = () => new RecordingIgClient(deleteHits = overwrite),
        settleBaseMillis = base, settleMillisPerItem = perItem,
        sleeper = requested += _)
        .collect()
      requested.toSeq
    }
    // no deletes -> no settle at all (the sleep is inside the
    // force-overwrite phase); with 3 deletes -> exactly base + 3*perItem
    assert(sleeps(base = 600, perItem = 150, overwrite = false) == Seq.empty)
    assert(sleeps(base = 600, perItem = 150, overwrite = true) == Seq(600L + 150L * 3))
    assert(sleeps(base = 0, perItem = 0, overwrite = true) == Seq(0L))
  }

  test("igload main: generate-default prints content, full run via injected client") {
    assert(graft.cli.IgLoadMain.run(Array("--generate-default"), spark) == 0)
    val dir = Files.createTempDirectory("graft-igload3")
    igZip(dir)
    Files.write(dir.resolve("fhir_hosts"),
      ("dev:\n  host_desc: D\n  target_service_url: http://unused\n  auth_type: none\n")
        .getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("content.yaml"),
      s"""MY-IG:
         |  source_type: IG
         |  path: ${dir.resolve("ig")}
         |  resources: CodeSystem ValueSet ImplementationGuide
         |  exclude-wildcards: example
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    IgLoadRecorder.clear()
    val rc = graft.cli.IgLoadMain.run(Array(
      "--host", "dev", "--hosts-file", dir.resolve("fhir_hosts").toString,
      "-c", dir.resolve("content.yaml").toString,
      "--force-overwrite", "--sleep-time", "0"), spark,
      makeClient = Some(_ => new RecordingIgClient(deleteHits = true)))
    assert(rc == 0)
    assert(IgLoadRecorder.seq.count(_._1 == "load") == 3)
    assert(IgLoadRecorder.seq.count(_._1 == "delete") == 3)
  }
}
