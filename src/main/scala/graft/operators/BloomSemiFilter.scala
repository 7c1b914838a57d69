package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Bloom-filter semi-join pre-filter: drop the rows of a corpus-sized
 * relation whose join key cannot possibly match a (much smaller) key
 * set, BEFORE the shuffle that a distinct/join would otherwise pay on
 * the full corpus. This is the manual form of Spark's own runtime
 * row-level filtering (`InjectRuntimeFilter`), built from the same
 * native expressions — `BloomFilterAggregate` to build the sketch and
 * `BloomFilterMightContain` (codegen'd, no UDF) to probe it — so it
 * applies where the optimizer's version does not reach: across separate
 * actions, ahead of an aggregate rather than a join, or with the small
 * side computed by an arbitrary plan.
 *
 * Semantics: the filtered output contains every large-side row whose
 * key IS in the key set, plus a false-positive fraction ~fpp of the
 * rest — callers follow with the exact join/aggregate they were going
 * to run anyway, so results are exact and only the shuffled volume
 * changes. Rows with NULL keys are dropped (a null key never matches a
 * semi-join). An EMPTY key set drops every row, which is the exact
 * semi-join answer.
 *
 * Keys must be LongType (the sketch hashes 64-bit values); hash wider
 * keys first — graft's shingle/content keys are already fnv64/md5-derived
 * longs. The sketch build is one map-side-combinable aggregate on the
 * small side followed by a single-row collect (the sketch is
 * `numBits/8` bytes — sized like any broadcast dimension, NOT like the
 * data), and the probe folds into the large side's scan stage as a
 * codegen'd filter.
 */
object BloomSemiFilter {

  /** Serialized bloom sketch over a Long key column; None when `keys`
    * has no non-null rows. `expectedItems`/`numBits` must respect the
    * session's runtime-bloom-filter caps (defaults: 4M items, 64M bits). */
  def build(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(col(keyCol)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    Option(keys.select(agg.as("bf")).head.getAs[Array[Byte]]("bf"))
  }

  /** Codegen'd membership probe against a driver-held sketch. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom), ColumnBridge.expression(key)))

  /** `large` reduced to rows whose `largeKey` might be in `keys.keyCol`
    * (exact members all kept, ~fpp false positives, null keys dropped). */
  def prefilter(large: DataFrame, keys: DataFrame, largeKey: String,
      keyCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame =
    build(keys, keyCol, expectedItems, fpp) match {
      case Some(bf) => large.where(mightContain(bf, col(largeKey)))
      case None     => large.where(lit(false))
    }
}
