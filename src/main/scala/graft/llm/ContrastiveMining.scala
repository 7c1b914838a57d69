package graft.llm

import graft.Presented
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Contrastive training-pair mining from an UNLABELED corpus — the
 * SimCSE/E5-style data builder: positives are semantic near-duplicate
 * pairs, negatives are what a retriever ranks highly for the anchor
 * MINUS the anchor's whole duplicate CLUSTER. The cluster exclusion is
 * the non-trivial part: a transitive duplicate (A≈B, B≈C, so A≈C with
 * no direct pair) ranked top-3 for A is almost certainly a FALSE
 * negative, and mining it poisons the embedding model — excluding
 * only direct pair-mates is the classic mistake. Labeled variants of
 * the same shape go through [[Retrieval.hardNegatives]] instead.
 *
 * RETRIEVER-AGNOSTIC by design: `results` is any (qid, cid, rnk) frame
 * — brute-force [[Similarity.cosineTopK]] for eval-sized anchor sets,
 * [[Similarity.bucketedTopK]] / [[ProductQuant.ivfAdcTopKPruned]] for
 * corpus-scale mining — so THIS operator never dictates the search
 * cost. `pairs` is any (id_a, id_b) positive-pair frame
 * ([[Similarity.nearDupPairs]], [[Dedup.MinHashNearDup]], or labels).
 *
 * SCALE SHAPE: clusters come from the pointer-jumping [[DupClusters]]
 * (log-round convergence, pairs-sized); `results` is top-k-bounded,
 * so both the anchor-cluster join and the per-qid re-rank window are
 * bounded by k rows per anchor (never Zipf-keyed); the final
 * positives × negatives join emits the triplet fan-out the trainer
 * asked for and nothing bigger. No collect, no corpus scan — the
 * corpus was only ever touched by the caller's retriever.
 *
 * Output: (qid, pos_cid, neg_cid, neg_rank), one row per
 * (anchor, positive-mate, negative) with neg_rank ≤ negK dense over
 * the anchor's surviving negatives in retriever order. Anchors with
 * no positive pair, or whose top-k is all cluster-mates, emit
 * nothing — mine a deeper k than negK when clusters are large.
 */
object ContrastiveMining {

  def triplets(pairs: DataFrame, results: DataFrame, negK: Int,
      ordered: Boolean = true): DataFrame = {
    require(negK > 0, s"triplets: negK must be positive, got $negK")
    // (doc_id, cluster_id): every doc that has at least one positive
    val clusters = DupClusters(pairs, "id_a", "id_b")
    val anchorCl = clusters
      .select(col("doc_id").as("qid"), col("cluster_id").as("_qcl"))
    val candCl = clusters
      .select(col("doc_id").as("cid"), col("cluster_id").as("_ccl"))
    // positives: the direct pair-mates, both orientations (transitive
    // cluster-mates are deliberately NOT positives — at distance ≥ 2
    // the similarity evidence is indirect; they are only EXCLUDED from
    // the negative side)
    val pos = pairs
      .select(col("id_a").cast("long").as("qid"),
        col("id_b").cast("long").as("pos_cid"))
      .unionByName(pairs.select(col("id_b").cast("long").as("qid"),
        col("id_a").cast("long").as("pos_cid")))
    val negs = results
      .select(col("qid").cast("long").as("qid"),
        col("cid").cast("long").as("cid"), col("rnk"))
      .filter(col("qid") =!= col("cid"))
      .join(anchorCl, Seq("qid")) // anchors only, cluster id carried
      .join(candCl, Seq("cid"), "left")
      .filter(col("_ccl").isNull || col("_ccl") =!= col("_qcl"))
      .withColumn("neg_rank",
        row_number().over(Window.partitionBy("qid").orderBy(col("rnk")))
          .cast("long"))
      .filter(col("neg_rank") <= negK)
    pos.join(negs, Seq("qid"))
      .select(col("qid"), col("pos_cid"), col("cid").as("neg_cid"),
        col("neg_rank"))
      .transform(Presented(_, ordered, "qid", "pos_cid", "neg_rank"))
  }
}
