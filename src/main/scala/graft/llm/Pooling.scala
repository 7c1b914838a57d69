package graft.llm

import graft.Presented
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vector pooling — collapsing many chunk embeddings into one document
 * vector. Long documents are embedded CHUNK-WISE (the encoder's
 * context window is the limit, [[TextAnalysis]]'s chunkDocuments the
 * splitter), and every downstream consumer of "the document's
 * embedding" — semantic dedup (pq12/31), ANN indexing (pq19/53),
 * DSIR-style selection — needs the chunks pooled back first.
 * Mean-pooling is the standard reduction.
 *
 * Scale shape: ONE shuffle of the vectors (the unavoidable move — the
 * reduction is over the data), as a keyed `collect_list` aggregate;
 * chunk counts per document are bounded by construction (documents ÷
 * chunk size), so per-group state is bounded and there is no Zipf
 * hazard. The element-wise sum folds over the CHUNK-ORDER-sorted list
 * (`sort_array` + `aggregate` + `zip_with`), so every double is
 * partitioning-invariant, and the oracle's left-to-right `list_sum`
 * over the same order adds in the same sequence — bit-identical, no
 * tolerance needed. Everything is codegen'd Catalyst higher-order
 * functions; no UDF.
 */
object Pooling {

  /**
   * Mean-pool chunk vectors into one vector per group. Output:
   * (groupCol, n_chunks, embedding), embedding[i] = ROUND(mean of the
   * chunks' element i, 6) as double. Rows with a null vector are
   * dropped (they carry no signal and would null the whole fold);
   * groups with no non-null vector emit nothing. Chunks within a
   * group must share the vector dimensionality — the caller's
   * embedding contract (a mismatched chunk yields nulls in the
   * pooled vector rather than silently truncating).
   *
   * @param orderCol breaks the fold order ties — any column unique
   *                 within the group (chunk index, chunk id); the
   *                 MEAN is order-independent mathematically, but the
   *                 floating-point fold is not, and determinism
   *                 requires a fixed order
   */
  def meanPool(df: DataFrame, groupCol: String, orderCol: String,
      vecCol: String, ordered: Boolean = true): DataFrame = {
    val sorted = array_sort(collect_list(struct(
      col("_ord").as("o"), col("_v").as("v"))))
    df.filter(col(vecCol).isNotNull)
      .select(col(groupCol), col(orderCol).as("_ord"), col(vecCol).as("_v"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_chunks"), sorted.as("_cs"))
      .select(col(groupCol), col("n_chunks"),
        transform(
          aggregate(
            slice(col("_cs"), lit(2), size(col("_cs")) - 1),
            transform(element_at(col("_cs"), 1).getField("v"),
              x => x.cast("double")),
            (acc, s) => zip_with(acc, s.getField("v"),
              (a, b) => a + b.cast("double"))),
          x => round(x / col("n_chunks"), 6)).as("embedding"))
      .transform(Presented(_, ordered, groupCol))
  }
}
