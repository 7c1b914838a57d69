package graft.sink

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/**
 * FHIR hosts-file handling (ref: wstlr/hostfile.py:17-63 and
 * tests/test_hostfile.py): a YAML file mapping a host *name* to the
 * connection details the load/purge sinks need. Every entry carries
 * `host_desc`, `target_service_url` and `auth_type`; auth-specific keys
 * (`username`/`password` for basic auth, `token` for bearer) sit beside
 * them.
 *
 * A missing or empty hosts file is a hard error after dumping an example
 * configuration (hostfile.py:55-62: example to stdout, complaint to
 * stderr, exit 1 — the library form throws [[HostsFileMissing]] and the
 * CLI mains translate that to exit 1).
 */
object Hosts {

  val DefaultHostsFile = "fhir_hosts"

  final case class HostConfig(
      name: String,
      hostDesc: String,
      targetServiceUrl: String,
      authType: String,
      settings: Map[String, String]) {

    /** Authorization header(s) for this host. Basic and bearer cover the
     *  self-hosted servers the reference targets; cloud-signed schemes
     *  (per-request signatures) need a custom poster. */
    def authHeaders: Map[String, String] = authType match {
      case "auth_basic" =>
        val cred = s"${settings.getOrElse("username", "")}:${settings.getOrElse("password", "")}"
        Map("Authorization" -> ("Basic " + java.util.Base64.getEncoder
          .encodeToString(cred.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      case "auth_bearer" | "auth_token" =>
        Map("Authorization" -> s"Bearer ${settings.getOrElse("token", "")}")
      case _ => Map.empty
    }

    /** An [[HttpPoster]] aimed at this host (one per partition — see
     *  [[FhirLoadSink]]). */
    // system-property overrides: operational tuning (and fast tests of
    // the failure path) without an API change
    def poster(
        maxRetries: Int =
          sys.props.get("graft.http.maxRetries").map(_.toInt).getOrElse(3),
        backoff429Millis: Long =
          sys.props.get("graft.http.backoff429Millis").map(_.toLong).getOrElse(35000L),
        backoffErrMillis: Long =
          sys.props.get("graft.http.backoffErrMillis").map(_.toLong).getOrElse(5000L),
        validateOnly: Boolean = false): HttpPoster =
      new HttpPoster(targetServiceUrl, maxRetries, backoff429Millis,
        backoffErrMillis, authHeaders, validateOnly)
  }

  class HostsFileMissing(val path: String) extends RuntimeException(
    s"A valid host configuration file, $DefaultHostsFile, must exist in cwd and was not found: $path")

  /** Example hosts configuration (ref: hostfile.py:17-45) — written when
   *  the file is absent so a user can fill in real values. */
  def exampleConfig: String =
    """# Example Hosts Configuration.
      |#
      |# This is a basic yaml file (yaml.org) where each root level tag represents a
      |# system "name" and it's children's keys represent key/values to assign to a
      |# host configuration which includes the authentication details.
      |#
      |# All host entries should have the following key/values:
      |# host_desc             - This is just a short description which can be used
      |#                         for log names or whatnot
      |# target_service_url    - This is the URL associated with the actual API
      |# auth_type             - This is the module name for the authentication used
      |#                         by the specified host
      |#
      |# Please note that there can be multiple hosts that use the same authentication
      |# mechanism. Users must ensure that each host has a unique "key"
      |example_basic:
      |  host_desc: Example auth_basic
      |  target_service_url: https://example.fhir.server/R4/fhir
      |  auth_type: auth_basic
      |  username: user
      |  password: secret
      |example_bearer:
      |  host_desc: Example auth_bearer
      |  target_service_url: https://example.fhir.server/R4/fhir
      |  auth_type: auth_bearer
      |  token: replace-with-token
      |""".stripMargin

  /**
   * Load and parse the hosts file. Missing or empty → the example config
   * goes to `exampleOut` (stdout in the CLI) and [[HostsFileMissing]] is
   * thrown (ref: hostfile.py:51-62, pinned by all three
   * tests/test_hostfile.py cases).
   */
  def load(path: String = DefaultHostsFile,
      exampleOut: String => Unit = print(_)): Map[String, HostConfig] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isRegularFile(p) || java.nio.file.Files.size(p) == 0) {
      exampleOut(exampleConfig)
      Console.err.println(
        s"\nA valid host configuration file, $DefaultHostsFile, must exist in cwd and was not\n" +
          "found. Example configuration has been written to stdout providing examples\n" +
          "for each of the auth types currently supported.")
      throw new HostsFileMissing(path)
    }
    val root = new ObjectMapper(new YAMLFactory()).readTree(
      new String(java.nio.file.Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    // insertion-ordered: properties() is a LinkedHashSet, but mapping it
    // as a scala Set re-hashes — go through an ordered Seq first
    scala.collection.immutable.ListMap(root.properties().asScala.toSeq.map { e =>
      val n = e.getValue
      val settings = n.properties().asScala
        .map(f => f.getKey -> f.getValue.asText()).toMap
      e.getKey -> HostConfig(
        name = e.getKey,
        hostDesc = settings.getOrElse("host_desc", ""),
        targetServiceUrl = settings.getOrElse("target_service_url", ""),
        authType = settings.getOrElse("auth_type", "none"),
        settings = settings)
    }.toSeq: _*)
  }
}
