package graft.sink

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/**
 * JDBC-backed id cache (ref: wstlr/idcache.py:26-113) against embedded
 * Derby — a real on-disk JDBC round trip: a cache written by one
 * instance ("run") primes the next instance from the database file.
 */
class JdbcIdCacheSpec extends AnyFunSuite {

  private def derbyUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_idcache")
    s"jdbc:derby:$dir/dbcache;create=true"
  }

  private val Sys = "https://whistler.test/study-ids"

  test("fixTargetSystem matches the reference transform (idcache.py:23-24)") {
    assert(JdbcIdCache.fixTargetSystem("https://example.com/some-sys.x") ===
      "example_com_some_sys_x")
    assert(JdbcIdCache.fixTargetSystem("plain-name") === "plain_name")
  }

  test("cache written by one run primes the next (persistent backing)") {
    val url = derbyUrl()
    val run1 = new JdbcIdCache(url, "ST1", "http://fhir.test")
    run1.storeId("Patient", Sys, "pt-0001", "srv-42")
    run1.storeId("Specimen", Sys, "sp-0001", "srv-43")
    run1.close()
    val run2 = new JdbcIdCache(url, "ST1", "http://fhir.test")
    assert(run2.getId(Sys, "pt-0001") === Some(("Patient", "srv-42")))
    assert(run2.getId(Sys, "sp-0001") === Some(("Specimen", "srv-43")))
    assert(run2.getId(Sys, "missing") === None)
    run2.close()
  }

  test("upsert replaces on the unique_id key (INSERT OR REPLACE semantics)") {
    val url = derbyUrl()
    val c = new JdbcIdCache(url, "ST1", "http://fhir.test")
    c.storeId("Patient", Sys, "pt-0001", "srv-1")
    c.storeId("Patient", Sys, "pt-0001", "srv-2")
    c.close()
    val again = new JdbcIdCache(url, "ST1", "http://fhir.test")
    assert(again.getId(Sys, "pt-0001") === Some(("Patient", "srv-2")))
    again.close()
  }

  test("priming filters by (study_id, fhir_endpoint) like idcache.py:66-75") {
    val url = derbyUrl()
    val a = new JdbcIdCache(url, "ST-A", "http://fhir.test")
    a.storeId("Patient", Sys, "pt-a", "srv-a")
    a.close()
    val b = new JdbcIdCache(url, "ST-B", "http://fhir.test")
    assert(b.getId(Sys, "pt-a") === None) // other study's row invisible
    b.close()
    val otherHost = new JdbcIdCache(url, "ST-A", "http://other.test")
    assert(otherHost.getId(Sys, "pt-a") === None)
    otherHost.close()
    val same = new JdbcIdCache(url, "ST-A", "http://fhir.test")
    assert(same.getId(Sys, "pt-a") === Some(("Patient", "srv-a")))
    same.close()
  }

  test("noDb stores only in RAM — a fresh instance does not see it") {
    val url = derbyUrl()
    val c = new JdbcIdCache(url, "ST1", "http://fhir.test")
    c.storeId("Patient", Sys, "ram-only", "srv-9", noDb = true)
    assert(c.getId(Sys, "ram-only") === Some(("Patient", "srv-9")))
    c.close()
    val fresh = new JdbcIdCache(url, "ST1", "http://fhir.test")
    assert(fresh.getId(Sys, "ram-only") === None)
    fresh.close()
  }

  test("unchanged mapping skips the DB write (idcache.py:108-113)") {
    val url = derbyUrl()
    val c = new JdbcIdCache(url, "ST1", "http://fhir.test")
    c.storeId("Patient", Sys, "pt-1", "srv-1")
    // same mapping again: must be a no-op (the reference checks the RAM
    // cache before writing); observable via noDb-like behavior: prime a
    // second instance, mutate through it, then re-store the ORIGINAL
    // mapping through the first — the first skips the write because its
    // RAM already holds it, so the second's value survives
    val other = new JdbcIdCache(url, "ST1", "http://fhir.test")
    other.storeId("Patient", Sys, "pt-1", "srv-2")
    c.storeId("Patient", Sys, "pt-1", "srv-1") // RAM hit -> no DB write
    c.close(); other.close()
    val check = new JdbcIdCache(url, "ST1", "http://fhir.test")
    assert(check.getId(Sys, "pt-1") === Some(("Patient", "srv-2")))
    check.close()
  }

  test("storeAll/loadAll bridge a cache DataFrame across runs") {
    val spark = TestSpark.spark
    val url = derbyUrl()
    val rows = Seq(
      Row(Sys, "pt-1", "Patient", "s1"),
      Row("https://whistler.test/other", "ob-1", "Observation", "s2"))
    val cacheDf = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), IdCacheStore.schema)
    val w = new JdbcIdCache(url, "ST1", "http://fhir.test")
    w.storeAll(cacheDf)
    w.close()
    val r = new JdbcIdCache(url, "ST1", "http://fhir.test")
    val back = r.loadAll(spark).collect().map(x =>
      (x.getString(0), x.getString(1), x.getString(2), x.getString(3))).toSet
    r.close()
    assert(back === Set(
      (Sys, "pt-1", "Patient", "s1"),
      ("https://whistler.test/other", "ob-1", "Observation", "s2")))
  }

  test("loadAll on an empty/new database is an empty cache frame") {
    val spark = TestSpark.spark
    val c = new JdbcIdCache(derbyUrl(), "ST1", "http://fhir.test")
    val df = c.loadAll(spark)
    assert(df.schema === IdCacheStore.schema)
    assert(df.isEmpty)
    c.close()
  }

  test("two systems colliding on the normalized table name fail loudly") {
    // the reference's lossy transform maps both onto one table and
    // silently mixes their ids; the bridge refuses instead
    val url = derbyUrl()
    val c = new JdbcIdCache(url, "ST1", "http://fhir.test")
    c.storeId("Patient", "https://x/a-b", "k1", "s1")
    val e = intercept[IllegalStateException](c.getId("https://x/a.b", "k1"))
    assert(e.getMessage.contains("normalize to table"))
    c.close()
  }

  test("isJdbcPath/normalizeUrl route jdbc: URLs and .sqlite3 shorthand") {
    assert(JdbcIdCache.isJdbcPath("jdbc:derby:/tmp/x;create=true"))
    assert(JdbcIdCache.isJdbcPath("/some/dir/.dbcache.sqlite3"))
    assert(!JdbcIdCache.isJdbcPath("/some/dir/idcache.parquet"))
    assert(JdbcIdCache.normalizeUrl("/d/.dbcache.sqlite3") === "jdbc:sqlite:/d/.dbcache.sqlite3")
    assert(JdbcIdCache.normalizeUrl("jdbc:derby:x") === "jdbc:derby:x")
  }
}
