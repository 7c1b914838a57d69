package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Corpus snapshot diff — the operational primitive behind "what changed
 * between crawl N and crawl N+1": every retraining-data refresh starts
 * by classifying documents into added / removed / changed so the
 * incremental stages ([[IncrementalDedup]], [[LineDedup]], the index
 * stores) process exactly the delta instead of the corpus.
 *
 * Spark shape: each snapshot collapses to an (id, 16-byte content hash)
 * projection — the text never shuffles — and ONE full-outer equi-join
 * on the id classifies every document. `unchanged` rows (the 99%+ bulk
 * at 100 TB) are filtered out by default BEFORE anything downstream
 * materializes them; pass `includeUnchanged = true` only for audits.
 * With both snapshots stored bucketed by id ([[IndexStore]] discipline)
 * the join plans with zero exchanges.
 *
 * Null texts hash to null; two null texts compare `unchanged` (the
 * null-safe `<=>` equality). Ids must be unique and NON-NULL within a
 * snapshot — the diff contract, as for any keyed store; null-id rows
 * are excluded (a null key never equi-joins, so leaving them in would
 * fabricate a spurious added+removed pair for unchanged content).
 */
object CorpusDiff {

  /** (doc_id, status, old_hash, new_hash) with status in
    * added | removed | changed (| unchanged when included). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String, textCol: String,
      includeUnchanged: Boolean = false, ordered: Boolean = true): DataFrame = {
    val o = oldSnap.filter(col(idCol).isNotNull)
      .select(col(idCol).as("_cd_oid"), TextOps.md5Hex(col(textCol)).as("old_hash"))
    val n = newSnap.filter(col(idCol).isNotNull)
      .select(col(idCol).as("_cd_nid"), TextOps.md5Hex(col(textCol)).as("new_hash"))
    val joined = o.join(n, col("_cd_oid") === col("_cd_nid"), "full_outer")
      .select(
        coalesce(col("_cd_oid"), col("_cd_nid")).as("doc_id"),
        when(col("_cd_oid").isNull, "added")
          .when(col("_cd_nid").isNull, "removed")
          .when(col("old_hash") <=> col("new_hash"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_hash"), col("new_hash"))
    (if (includeUnchanged) joined else joined.filter(col("status") =!= "unchanged"))
      .transform(Presented(_, ordered, "doc_id"))
  }

  /**
   * Population-stability-index drift between two snapshots of a numeric
   * feature, per group — [[diff]] tells you WHICH documents changed;
   * this tells you whether the corpus's SHAPE changed (length
   * distributions creeping, a source's quality profile shifting — the
   * text-side sibling of [[Clustering.snapshotDrift]]'s embedding
   * report). PSI = Σ_buckets (p−q)·ln(p/q) over fixed bucket edges;
   * the usual read: <0.1 stable, 0.1–0.25 drifting, >0.25 retrain/
   * re-examine.
   *
   * SCALE SHAPE: each snapshot collapses to (group, bucket) counts in
   * one map-side-combined aggregate (the feature never shuffles raw);
   * everything after is groups×buckets-sized. A dense spine
   * (groups × all buckets) is generated so zero-zero buckets still
   * contribute their smoothed term — dropping them would bias PSI
   * whenever totals differ. Laplace smoothing p=(n+1)/(N+B) keeps
   * empty buckets finite and every share an exact rational; the only
   * libm crossing is ln (terms folded in bucket order — the sorted
   * fold discipline — and ROUND(4)).
   *
   * Identity law: PSI(X, X) is exactly 0.0 (p==q per bucket, terms are
   * exact zeros). Null groups/features are excluded (documented
   * contract, as in [[diff]]).
   *
   * Output: (groupCol, n_old, n_new, psi) — totals are the bucketed
   * row counts per group.
   */
  def distributionShift(oldSnap: DataFrame, newSnap: DataFrame,
      groupCol: String, featureCol: String, edges: Seq[Double],
      ordered: Boolean = true): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted &&
      edges.distinct == edges,
      s"distributionShift: edges must be distinct ascending: $edges")
    val nB = edges.size + 1
    def bucketed(df: DataFrame, n: String) = {
      val x = col(featureCol).cast("double")
      val bkt = edges.foldLeft(lit(1))((acc, e) => acc + (x > lit(e)).cast("int"))
      df.filter(col(groupCol).isNotNull && x.isNotNull)
        .groupBy(col(groupCol).as("grp"), bkt.as("bucket"))
        .agg(count(lit(1)).as(n))
    }
    val o = bucketed(oldSnap, "n_o")
    val nw = bucketed(newSnap, "n_n")
    val spine = o.select("grp").unionByName(nw.select("grp")).distinct()
      .select(col("grp"), explode(sequence(lit(1), lit(nB))).as("bucket"))
    val cells = spine
      .join(o, Seq("grp", "bucket"), "left")
      .join(nw, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"),
        coalesce(col("n_o"), lit(0L)).as("n_o"),
        coalesce(col("n_n"), lit(0L)).as("n_n"))
    val totals = cells.groupBy("grp")
      .agg(sum("n_o").as("t_o"), sum("n_n").as("t_n"))
    val p = (col("n_o") + 1).cast("double") / (col("t_o") + nB).cast("double")
    val q = (col("n_n") + 1).cast("double") / (col("t_n") + nB).cast("double")
    cells.join(broadcast(totals), Seq("grp"))
      .select(col("grp"), col("bucket"), col("t_o"), col("t_n"),
        ((p - q) * log(p / q)).as("_term"))
      .groupBy("grp")
      .agg(max("t_o").as("n_old"), max("t_n").as("n_new"),
        sort_array(collect_list(struct(col("bucket"), col("_term")))).as("_ts"))
      .select(col("grp").as(groupCol), col("n_old"), col("n_new"),
        round(aggregate(col("_ts"), lit(0.0),
          (acc, s) => acc + s.getField("_term")), 4).as("psi"))
      .transform(Presented(_, ordered, groupCol))
  }
}
