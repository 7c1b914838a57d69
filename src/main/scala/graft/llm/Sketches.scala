package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Count-min sketch (Cormode & Muthukrishnan 2005) over an item column
 * — the fixed-size frequency summary for when the exact `groupBy(item)`
 * is itself corpus-shaped (billions of distinct n-grams at 100 TB):
 * depth × width counters answer point frequency queries with one-sided
 * error (estimate >= truth, over-count bounded by ~2N/width w.h.p. per
 * row, min over depth rows tightens it).
 *
 * Spark shape: each input row explodes to `depth` (row, bucket) pairs
 * — a codegen'd projection — and ONE map-side-combined aggregate
 * produces the depth*width-bounded sketch. Nothing else shuffles; the
 * sketch is broadcastable downstream. Hashing is the portable
 * `u32(md5(salt ':' j ':' item)) % width` (the [[Packing]]/[[Dsir]]
 * discipline), so the sketch itself is oracle-checkable in exact
 * integers (pq57) and mergeable across corpora by plain addition
 * (counter-wise `+` — pinned in the spec).
 */
object CountMin {

  /** Build the sketch: one (row, bucket, cnt) output row per non-empty
    * counter (absent counters are zero — the SQL GROUP BY shape). Null
    * items are skipped.
    *
    * Row j's bucket is a 32-bit window of an md5: one digest yields
    * FOUR independent 32-bit words, so rows share a digest in groups
    * of 4 (row j reads window j%4 of digest j/4). The (row, bucket)
    * pairs are generated in ONE TYPED pass — the Catalyst form
    * computed the shared digest once per row-struct under a Generate
    * (no codegen subexpression elimination there: depth md5+conv
    * chains per item); the JVM twin is the exact hashing
    * [[Sketch.estimate]] already runs driver-side, and the counts are
    * integers, so equivalence is arithmetic (pinned by pq57). The
    * item is cast to string IN CATALYST first, so non-string callers
    * keep Spark's cast formatting. */
  def build(df: DataFrame, itemCol: String, depth: Int = 4, width: Int = 1024,
      salt: String = "cms", ordered: Boolean = true): DataFrame = {
    require(depth >= 1 && width >= 1, s"build: need depth, width >= 1; got $depth, $width")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val pairSchema = StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false)))
    val nDigests = (depth + 3) / 4
    df.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string").as("_i"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val item = r.getString(0)
          val digests = Array.tabulate(nDigests)(g =>
            TextOps.md5HexJvm(md, s"$salt:$g:$item"))
          (0 until depth).iterator.map { j =>
            val off = 8 * (j % 4)
            Row(j.toLong, java.lang.Long.parseLong(
              digests(j / 4).substring(off, off + 8), 16) % width)
          }
        }
      }(Encoders.row(pairSchema))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
      .transform(Presented(_, ordered, "row", "bucket"))
  }

  /** Driver-side point-query view of a collected sketch. */
  final case class Sketch(depth: Int, width: Int, salt: String,
      counters: Map[(Long, Long), Long]) {
    /** Estimated frequency: min over rows — always >= the true count.
      * Mirrors [[CountMin.bucket]]'s window-of-a-shared-digest layout. */
    def estimate(item: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until depth).map { j =>
        val off = 8 * (j % 4)
        val b = java.lang.Long.parseLong(
          TextOps.md5HexJvm(md, s"$salt:${j / 4}:$item")
            .substring(off, off + 8), 16) % width
        counters.getOrElse((j.toLong, b), 0L)
      }.min
    }
  }

  /** Collect a built sketch (depth*width-bounded by construction). */
  def collect(sketch: DataFrame, depth: Int, width: Int, salt: String): Sketch =
    Sketch(depth, width, salt,
      sketch.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)

  /** Merge two sketches built with identical (depth, width, salt):
    * counter-wise addition — the stream/shard-merge property that makes
    * the sketch usable incrementally. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
}

/**
 * HyperLogLog sketch (Flajolet et al. 2007) over an item column — the
 * fixed-size DISTINCT-count summary CountMin's frequency table can't
 * answer: m registers estimate cardinality with ~1.04/sqrt(m) relative
 * error, and the register table merges across corpora/shards/streams by
 * plain MAX (a semilattice — merge(sketch(A), sketch(B)) EQUALS
 * sketch(A ∪ B) exactly, not just statistically; pinned in the spec).
 * At 100 TB this replaces a corpus-shaped `COUNT(DISTINCT ...)` per
 * source/day with an m-row table per group that unions for free.
 *
 * Spark shape: one codegen'd projection derives (register, rho) from
 * two independent 32-bit md5 words — register = u32(hex[1..8]) % m,
 * rho = leading-zero count of u32(hex[9..16]) + 1 computed EXACTLY as
 * `33 - length(bin(v))` (no floating log) — then ONE map-side-combined
 * `groupBy(register).agg(max)` produces the m-bounded sketch. The
 * oracle computes rho as `32 - floor(log2(v))`, identical by
 * construction for all v >= 1 (floor(log2 v) = length(bin v) - 1;
 * log2 of an integer < 2^32 is > 3e-10 away from the next integer, so
 * the double floor is exact), making the sketch itself exact-integer
 * cross-engine (pq66). Estimation stays a driver-side view of the
 * m-bounded table, like [[CountMin.Sketch]].
 */
object Hll {

  /** Build the register table (register, max_rho): one row per
    * register hit by at least one item (absent registers are zero —
    * the SQL GROUP BY shape). Null items are skipped. */
  def sketch(df: DataFrame, itemCol: String, m: Int = 1024,
      salt: String = "hll", ordered: Boolean = true): DataFrame = {
    require(m >= 16, s"sketch: need m >= 16 registers; got $m")
    val hex = md5(concat(lit(s"$salt:"), col(itemCol).cast("string")).cast("binary"))
    val reg = conv(substring(hex, 1, 8), 16, 10).cast("long") % m
    val v = conv(substring(hex, 9, 8), 16, 10).cast("long")
    val rho = when(v === 0L, lit(33L)).otherwise(lit(33L) - length(bin(v)))
    df.filter(col(itemCol).isNotNull)
      .select(reg.as("register"), rho.as("rho"))
      .groupBy("register").agg(max("rho").as("max_rho"))
      .transform(Presented(_, ordered, "register"))
  }

  /** Merge register tables built with identical (m, salt): register-wise
    * MAX — exactly sketch-of-the-union, the property that makes per
    * shard/day/source sketches composable without rescans. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("register").agg(max("max_rho").as("max_rho"))

  /** Per-group register tables (groupCol, register, max_rho) — the
    * "distinct documents per source/day" report as one aggregate whose
    * output is m rows per group instead of a corpus-shaped COUNT
    * DISTINCT; group sketches roll up to any coarser grouping (or the
    * corpus total) by the same register-wise MAX. Null groups form
    * their own group, as SQL GROUP BY does. */
  def sketchByGroup(df: DataFrame, groupCol: String, itemCol: String,
      m: Int = 1024, salt: String = "hll", ordered: Boolean = true): DataFrame = {
    require(m >= 16, s"sketchByGroup: need m >= 16 registers; got $m")
    val hex = md5(concat(lit(s"$salt:"), col(itemCol).cast("string")).cast("binary"))
    val reg = conv(substring(hex, 1, 8), 16, 10).cast("long") % m
    val v = conv(substring(hex, 9, 8), 16, 10).cast("long")
    val rho = when(v === 0L, lit(33L)).otherwise(lit(33L) - length(bin(v)))
    df.filter(col(itemCol).isNotNull)
      .select(col(groupCol), reg.as("register"), rho.as("rho"))
      .groupBy(col(groupCol), col("register")).agg(max("rho").as("max_rho"))
      .transform(Presented(_, ordered, groupCol, "register"))
  }

  /** The bias-correction constant — ONE definition for the scalar and
    * Column estimator forms. */
  private def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The estimator over (Σ2^(-max_rho) of present registers, their
    * count) as a scalar — [[estimate]] and [[estimateExpr]] both
    * evaluate exactly this arithmetic (identical correctly-rounded op
    * sequence), so driver and distributed estimates cannot drift. */
  private def estimateScalar(m: Int, presentSum: Double, presentCnt: Long): Double = {
    val zeros = m - presentCnt
    val sum = presentSum + zeros.toDouble
    val raw = alphaFor(m) * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros.toDouble)
    else raw
  }

  /** [[estimateScalar]] as Columns — the distributed form. All inputs
    * are exact (dyadic powers sum exactly in doubles), so the estimate
    * is deterministic and engine-portable. */
  private def estimateExpr(m: Int, presentSum: Column, presentCnt: Column): Column = {
    val zeros = lit(m.toLong) - presentCnt
    val sum = presentSum + zeros.cast("double")
    val raw = lit(alphaFor(m) * m * m) / sum
    when(raw <= lit(2.5 * m) && zeros > 0L,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
  }

  /** Distributed per-group cardinality estimates over a
    * [[sketchByGroup]] register table: (group, estimate) from one
    * m-bounded aggregate per group — no driver collect, so "distinct
    * docs per source" over thousands of groups stays a DataFrame. */
  def estimateByGroup(registers: DataFrame, groupCol: String, m: Int,
      ordered: Boolean = true): DataFrame =
    registers
      .groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("max_rho").cast("double"))).as("_ps"),
        count(lit(1)).as("_pc"))
      .select(col(groupCol), estimateExpr(m, col("_ps"), col("_pc")).as("estimate"))
      .transform(Presented(_, ordered, groupCol))

  /** Driver-side estimate from a collected register table: the standard
    * raw HLL estimator alpha_m·m²/Σ2^(-M_j) (empty registers contribute
    * 2^0) with the small-range linear-counting correction. The sum of
    * dyadic 2^(-rho) terms is exact in doubles, so the estimate is
    * deterministic under any collection order. */
  def estimate(registers: DataFrame, m: Int): Double = {
    // ONE sketch only: require the exact (register, max_rho) column
    // set (any order — read by NAME below). A sketchByGroup table also
    // has max_rho, and pooling its registers across groups is a silent
    // nonsense estimate; a row-count bound alone misses SPARSE by-group
    // tables whose total present registers still fit under m
    require(registers.columns.toSet == Set("register", "max_rho"),
      s"estimate expects exactly (register, max_rho) columns, got " +
        s"(${registers.columns.mkString(", ")}) — a per-group " +
        "(sketchByGroup) table needs estimateByGroup")
    val rhos = registers.select(col("max_rho")).collect().map(_.getLong(0)).sorted
    require(rhos.length <= m,
      s"${rhos.length} registers for m=$m — was this sketch built " +
        "with a different m?")
    // ascending-rho sum == descending-term sum: exact anyway (dyadics)
    estimateScalar(m, rhos.map(r => math.pow(2.0, -r.toDouble)).sum, rhos.length.toLong)
  }
}
