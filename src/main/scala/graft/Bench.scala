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
 * Catalyst prune both). Failures are recorded as failures, never as timings.
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

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // Dev aid: SPARK_GRAFT_ONLY=pq8_cosine_topk,pq9_ann_bucketed runs a
    // subset (and SPARK_GRAFT_REPS repeats the timed run) for profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        runOnce(fn, warmDir) // warmup, untimed
        (1 to reps).foreach { rep =>
          val t0 = System.nanoTime()
          runOnce(fn, sfDir)
          val dt = (System.nanoTime() - t0) / 1e9
          timings(if (rep == 1) name else s"$name#$rep") = dt
        }
      } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      } finally {
        // operators that persist intermediates (e.g. MinHash LSH's shingle
        // cache) would otherwise accumulate across queries and perturb
        // later timings via memory pressure
        spark.catalog.clearCache()
      }
    }
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fails = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = f"${timings.values.sum}%.3f"
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
