package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every declared query against SPARK_GRAFT_SF_DIR and
 * prints ONE JSON line with per-query wall seconds.
 *
 * Methodology: each query is first executed once at sf0.001 (untimed warmup
 * — triggers codegen/JIT compilation of the same plan shapes), then timed at
 * the bench scale factor with a full-result noop write, which executes every
 * projected expression and the final ORDER BY (a bare `count()` would let
 * Catalyst prune both). The reported time is the MIN of SPARK_GRAFT_BEST
 * (default 3) timed executions — the standard estimator for the engine's
 * cost on a multi-tenant host, where the max is dominated by neighbor noise
 * (observed: identical code swinging 2-4x between runs). The best-of passes
 * are INTERLEAVED (full query sweep x N, min per query across sweeps) rather
 * than back-to-back reps of each query, so a single noisy multi-second
 * window cannot poison every sample of one query — it inflates at most one
 * sweep, and the other sweeps land outside it. Failures are recorded as
 * failures, never as timings.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.register(spark) // SQL surface: graft_dot

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // Dev aids: SPARK_GRAFT_ONLY=pq8_cosine_topk,pq9_ann_bucketed runs a
    // subset; SPARK_GRAFT_REPS>1 records every timed run individually
    // (profiling, back-to-back per query); SPARK_GRAFT_BEST=N (default 3)
    // controls the number of interleaved min-of-N sweeps.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val best = sys.env.getOrElse("SPARK_GRAFT_BEST", "3").toInt.max(1)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      runOnce(fn, sfDir)
      (System.nanoTime() - t0) / 1e9
    }
    def attempt(name: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          failed += name
          // drop every rep key too (`name#2`...), else a failure at rep k>1
          // leaves earlier reps contributing timings for a failed query
          timings.filterInPlace((k, _) => k != name && !k.startsWith(name + "#"))
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      } finally {
        // operators that persist intermediates (e.g. MinHash LSH's shingle
        // cache) would otherwise accumulate across queries and perturb
        // later timings via memory pressure
        spark.catalog.clearCache()
      }
    if (reps > 1) {
      // profiling mode: every run visible, back-to-back per query
      names.foreach { name =>
        attempt(name) {
          runOnce(SparkEntry.queries(name), warmDir) // warmup, untimed
          (1 to reps).foreach { rep =>
            timings(if (rep == 1) name else s"$name#$rep") =
              timed(SparkEntry.queries(name))
          }
        }
      }
    } else {
      // warmup sweep (untimed), then `best` interleaved timed sweeps
      names.foreach { name =>
        attempt(name)(runOnce(SparkEntry.queries(name), warmDir))
      }
      (1 to best).foreach { _ =>
        names.foreach { name =>
          if (!failed.contains(name)) attempt(name) {
            val t = timed(SparkEntry.queries(name))
            timings(name) = timings.get(name).fold(t)(math.min(_, t))
          }
        }
      }
    }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would emit invalid JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = num(timings.values.sum)
    // mode split: streaming-replay rows measure micro-batch + state-store
    // machinery whose oracles are instantaneous batch SQL — report both
    // subtotals so the artifact carries comparable denominators
    val streamingTotal = num(timings.collect {
      case (k, v) if PipelineQueries.StreamingQueryNames.contains(k.takeWhile(_ != '#')) => v
    }.sum)
    val batchTotal = num(timings.collect {
      case (k, v) if !PipelineQueries.StreamingQueryNames.contains(k.takeWhile(_ != '#')) => v
    }.sum)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","batch_total":$batchTotal,"streaming_total":$streamingTotal,"queries":$qs,"failed":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
