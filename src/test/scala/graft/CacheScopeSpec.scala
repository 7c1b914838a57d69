package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The per-operator cache-release contract: operators that persist
 * intermediates register them with the CacheScope they were called
 * with, and releasing that scope unpersists exactly those — no
 * session-wide clearCache, no caller-owned caches touched.
 */
class CacheScopeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Persistent-RDD ids currently registered with the context, after
    * letting in-flight async unpersists settle to a fixed point. */
  private def settledRddIds(): Set[Int] = {
    var prev = spark.sparkContext.getPersistentRDDs.keySet.toSet
    var tries = 0
    while (tries < 50) {
      Thread.sleep(100)
      val cur = spark.sparkContext.getPersistentRDDs.keySet.toSet
      if (cur == prev) return cur
      prev = cur
      tries += 1
    }
    prev
  }

  private def awaitReleased(ids: Set[Int]): Boolean = {
    var tries = 0
    while (tries < 100) {
      if (spark.sparkContext.getPersistentRDDs.keySet.toSet.intersect(ids).isEmpty)
        return true
      Thread.sleep(100)
      tries += 1
    }
    false
  }

  test("scope.release unpersists an operator's persisted intermediate; a caller cache survives") {
    CacheScope.releaseSession()
    val base = settledRddIds()
    // a caller-owned cache that must SURVIVE the operator scope release
    val mine = spark.read.parquet(s"$dir/nation.parquet").persist()
    mine.count()
    val withMine = settledRddIds() -- base
    assert(withMine.nonEmpty, "caller persist should register storage")

    val scope = new CacheScope
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val q = graft.llm.TextAnalysis.tfIdfTopTerms(d, "doc_id", "text", k = 2,
      scope = scope)
    val rows = q.count()
    assert(rows > 0)
    val opIds = settledRddIds() -- base -- withMine
    assert(opIds.nonEmpty, "tfIdfTopTerms should persist its tf intermediate")

    scope.release()
    assert(awaitReleased(opIds), s"scope.release left operator storage behind: $opIds")
    // the caller's own cache is untouched — the clearCache failure mode
    assert(spark.sparkContext.getPersistentRDDs.keySet.toSet.intersect(withMine)
      == withMine, "scope.release must not touch caller-owned caches")
    // and the operator result is still correct via lineage recompute
    assert(q.count() == rows)
    mine.unpersist(true)
    CacheScope.releaseSession()
  }

  test("iterative operators hold O(1) checkpoints and release the survivor via scope") {
    import spark.implicits._
    CacheScope.releaseSession()
    val base = settledRddIds()
    // an 8-node chain forces multiple propagation rounds
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val scope = new CacheScope
    val labels = graft.llm.DupClusters(pairs, "a", "b", scope = scope)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1L to 8L).map(_ -> 1L).toMap)
    // per-round checkpoints were released in-loop: at most the final
    // labels table (plus nothing else) survives the call
    val leftover = settledRddIds() -- base
    assert(leftover.size <= 1,
      s"DupClusters leaked per-round checkpoints: ${leftover.size} RDDs")
    scope.release()
    assert(awaitReleased(leftover), "scope.release left the final checkpoint behind")
  }

  test("resolveKeepers releases superseded rounds and tracks only the final one") {
    import spark.implicits._
    CacheScope.releaseSession()
    val base = settledRddIds()
    // dup_of chain 4 -> 3 -> 2 -> 1(history keeper 100): three hops
    val classified = Seq(
      (1L, "dup_of_history", Some(100L)),
      (2L, "dup_in_batch", Some(1L)),
      (3L, "dup_in_batch", Some(2L)),
      (4L, "dup_in_batch", Some(3L)),
      (5L, "new", None: Option[Long])
    ).toDF("doc_id", "status", "dup_of")
    val scope = new CacheScope
    val resolved = graft.llm.IncrementalMinHash.resolveKeepers(classified, scope = scope)
    val got = resolved.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(2L) == Some(100L) && got(3L) == Some(100L) && got(4L) == Some(100L))
    assert(got(5L).isEmpty)
    val leftover = settledRddIds() -- base
    assert(leftover.size <= 1,
      s"resolveKeepers leaked per-round checkpoints: ${leftover.size} RDDs")
    scope.release()
    assert(awaitReleased(leftover), "scope.release left the final checkpoint behind")
  }
}
