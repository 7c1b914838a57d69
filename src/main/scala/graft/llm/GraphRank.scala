package graft.llm

import graft.Presented
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank over an edge list — graph centrality for corpus curation:
 * run it over the k-NN similarity graph (cosineTopK / bucketedTopK
 * edges) and high-rank nodes are the HUBS — boilerplate templates,
 * near-duplicate centers, content that everything resembles — the
 * same pathology the bitext ratio-margin corrects locally, surfaced
 * globally; over a link/citation graph it is the classic quality
 * prior. Retriever/graph-agnostic: any (src, dst) frame works.
 *
 *   r_{i+1}(v) = (1−d)/N + d · ( Σ_{u→v} r_i(u)/outdeg(u) + D_i/N )
 *
 * with D_i the dangling mass (rank parked on nodes with no
 * out-edges), redistributed uniformly — ranks sum to 1 every
 * iteration (the law the spec pins).
 *
 * SCALE SHAPE: per iteration, ONE shuffle keyed on the destination
 * node (the contribution aggregate, map-side combined) plus the
 * node-spine join; ranks/degrees are node-sized, edges never
 * materialize to the driver; the dangling mass is a one-double
 * aggregate. Lineage is cut with an eager localCheckpoint per
 * iteration (the [[DupClusters]] iterative-DataFrame discipline), so
 * plans stay constant-depth however many iterations run. Fixed
 * iteration count by design — convergence detection is a sum probe
 * the caller can layer on; data pipelines run a fixed small budget.
 *
 * DETERMINISM: pure double arithmetic, no libm; per-node contribution
 * sums are order-dependent at the last ulp only, so ROUND(6) output
 * is engine-portable (the pq54 VALUES discipline).
 */
object GraphRank {

  /** @return (id, rank) per node, rank ROUND(6), Σ rank = 1. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      ordered: Boolean = true): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1,
      s"pageRank: damping in (0, 1), got $damping")
    // all checkpoints are released on exit (and each iteration's ranks
    // as soon as the next supersedes it) — an iters=20 run must not pin
    // 20 node-sized RDDs in the block manager for the session's life
    val scope = new graft.CacheScope
    def tracked(df: DataFrame): DataFrame = {
      // checkpoint storage is released via the backing RDD —
      // DataFrame.unpersist only targets catalog-cached plans
      graft.CacheScope.checkpointRdd(df).foreach(scope.track)
      df
    }
    try {
      val e = tracked(edges
        .select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
        .filter(col("_src").isNotNull && col("_dst").isNotNull)
        .dropDuplicates("_src", "_dst")
        .localCheckpoint(true)) // consumed every iteration + degree pass
      val nodes = tracked(e.select(col("_src").as("_id"))
        .unionByName(e.select(col("_dst").as("_id")))
        .distinct().localCheckpoint(true))
      val n = nodes.count()
      require(n > 0, "pageRank: empty graph")
      val outdeg = tracked(e.groupBy(col("_src"))
        .agg(count(lit(1)).as("_d")).localCheckpoint(true))
      var ranks = nodes.select(col("_id"), lit(1.0 / n).as("_r"))
        .localCheckpoint(true)
      for (_ <- 0 until iters) {
        val dangling = ranks
          .join(outdeg, ranks("_id") === outdeg("_src"), "left_anti")
          .agg(coalesce(sum(col("_r")), lit(0.0)))
          .head.getDouble(0)
        val contrib = e
          .join(outdeg, "_src")
          .join(ranks, e("_src") === ranks("_id"))
          .groupBy(col("_dst").as("_cid"))
          .agg(sum(col("_r") / col("_d")).as("_s"))
        val next = nodes
          .join(contrib, nodes("_id") === col("_cid"), "left")
          .select(col("_id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * (coalesce(col("_s"), lit(0.0)) +
                lit(dangling / n))).as("_r"))
          .localCheckpoint(true)
        graft.CacheScope.checkpointRdd(ranks)
          .foreach(_.unpersist(blocking = false))
        ranks = next
      }
      // materialize the (tiny) result off the final checkpoint so the
      // scope release below can't pull blocks out from under a consumer
      val outRows = ranks
        .select(col("_id").as("id"), round(col("_r"), 6).as("rank"))
        .localCheckpoint(true)
      graft.CacheScope.checkpointRdd(ranks)
        .foreach(_.unpersist(blocking = false))
      outRows.transform(Presented(_, ordered, "id"))
    } finally scope.release()
  }
}
