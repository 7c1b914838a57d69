package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Near-dup pair -> cluster resolution: connected components over the
 * pair graph, with the canonical representative of each component (the
 * doc to KEEP) being its minimum id. Fuzzy dedup emits PAIRS
 * ([[MinHashNearDup]], [[SimHashNearDup]], [[NgramJaccard]],
 * [[graft.llm.Similarity.nearDupPairs]]); production dedup needs the
 * transitive closure — A~B and B~C must drop two docs, not one from
 * each pair independently.
 *
 * Shape: iterative min-label propagation. Each round unions every
 * node's own label with its neighbors' labels (one shuffle join on the
 * bidirected edge set) and keeps the minimum (one agg shuffle); labels
 * are min-monotone, so convergence is detected by the label sum going
 * stable — one O(1)-row action per round, never a data collect. Rounds
 * needed = O(log component diameter); near-dup components are shallow
 * (clusters of copies, not long chains), so 2-3 rounds is typical and
 * the cap is a safety bound, not a tuning knob. Lineage is cut per
 * round with an eager localCheckpoint — the iterative-DataFrame norm
 * (same discipline as the reference-resolution fixpoint,
 * [[graft.sink.ReferenceResolution]]). At cluster scale each round is
 * fully partition-parallel over the edge set; for graphs with extreme
 * diameters swap the loop body for large-star/small-star — the loop
 * skeleton and convergence test stay the same.
 *
 * Only ids that appear in at least one pair come out (singletons need
 * no canonical pick). Output: (doc_id, cluster_id), one row per
 * distinct id, cluster_id = min id of the component.
 */
object DupClusters {

  def apply(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 20): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true) // scanned every round; compute the pair source once
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    // decimal sum: overflow-safe convergence witness for 64-bit ids
    // (null on an empty graph — an empty pair set converges immediately)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prev = labelSum(labels)
    var rounds = 0
    var converged = labels.isEmpty
    while (!converged && rounds < maxRounds) {
      val nbr = edges.join(labels, edges("dst") === labels("doc_id"))
        .select(edges("src").as("doc_id"), labels("cluster_id"))
      val next = labels.unionByName(nbr)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val cur = labelSum(next)
      converged = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      rounds += 1
    }
    labels
  }
}
