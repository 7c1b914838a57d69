package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan contracts (SURVEY.md §4): filters reach the parquet scan,
 * projections prune the read schema, and dimension joins broadcast.
 * These pin the *plan*, not results — a regression here is invisible to
 * the correctness gate but fatal at 100 TB.
 */
class PlanAssertionsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("filter + projection push down to the parquet scan") {
    val q = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val plan = q.queryExecution.executedPlan.toString
    // predicate pushdown: both comparisons reach the scan (the plan
    // string truncates the pushed list, so match the untruncated
    // DataFilters twin for the second predicate)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(plan.contains("GreaterThan(l_quantity,45.0)"))
    assert(plan.contains("= R)"))
    // column pruning: the scan reads exactly the needed columns
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .forall(readSchema.contains))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("dimension joins broadcast; the fact side never shuffles for the join") {
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val q = supplier.join(nation, col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("ANN candidate joins are equi-joins, never cartesian; multi-probe explodes only the query side") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val multi = graft.llm.Similarity.bucketedTopK(e, q, "vec_id", "embedding",
      k = 3, bucketBits = 6, srp = true, probes = 4)
    val mp = multi.queryExecution.optimizedPlan.toString
    // bucket-equality join (hash-partitionable); a cartesian/BNL product
    // here would be the 100 TB scale-killer
    assert(!mp.contains("Cartesian") && !mp.contains("BroadcastNestedLoop"))
    // the probe expansion is a Generate (explode) of the probe-key array
    assert(mp.contains("Generate"))
    // and no row-level Scala UDF anywhere in the probe-key computation
    assert(!mp.toLowerCase.contains("scalaudf"))

    val ivf = graft.llm.Ivf.topK(e, q, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 2)
    val ip = ivf.queryExecution.optimizedPlan.toString
    assert(!ip.contains("Cartesian") && !ip.contains("BroadcastNestedLoop"))
  }
}
