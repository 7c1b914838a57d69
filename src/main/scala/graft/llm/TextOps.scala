package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level text primitives for the large-scale training-data pipeline
 * operators (dedup, fingerprinting, text analysis). Everything here is a
 * pure per-row Catalyst expression — no UDFs, no shuffle, no driver-side
 * data movement — so the operators composed from these scale linearly with
 * the input. Fixed-size loops (hash count, bit positions) are unrolled
 * driver-side into static expressions rather than evaluated as dynamic
 * array indexing, which keeps every index/shift a constant the optimizer
 * can fold.
 *
 * Hashing discipline: all content hashes are md5 over UTF-8 bytes —
 * deterministic and engine-portable (the DuckDB oracle computes
 * bit-for-bit identical hex strings). MinHash uses *string-min over salted
 * md5 hex* rather than integer hashes: lexicographic min over uniformly
 * distributed hex strings is an identically distributed permutation-min,
 * and it avoids any cross-engine integer-hash mismatch.
 */
object TextOps {

  /** Whitespace tokenizer: trim, split on `\s+`. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** md5 hex (lowercase) of a string column's UTF-8 bytes. */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /**
   * Distinct word n-gram shingle set from a token array. Requires
   * size(toks) >= n (callers filter first; Spark's `sequence` would
   * produce a descending range otherwise). Grams joined with single
   * spaces, matching the tokenizer.
   */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    if (n == 1) array_distinct(toks)
    else {
      val gram = (i: Column) =>
        concat_ws(" ", (0 until n).map(o => element_at(toks, (i + lit(o)).cast("int"))): _*)
      array_distinct(transform(sequence(lit(1), size(toks) - lit(n - 1)), gram))
    }
  }

  /**
   * MinHash signature: k permutation-mins, where permutation i is
   * "lexicographic order of md5(i + ':' + shingle)". Output: array of k
   * hex strings. Cost: k * |shingles| md5 calls per row, no shuffle.
   */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map(k =>
      array_min(transform(shingleCol, s =>
        md5Hex(concat(lit(k.toString), lit(":"), s))))): _*)

  /**
   * LSH band keys from a minhash signature: `bands` keys, each the md5 of
   * `rowsPerBand` concatenated signature entries. Two docs agree on band b
   * iff their signatures agree on all rows of that band — the standard
   * banding construction (collision prob = 1-(1-j^r)^b).
   */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b =>
      md5Hex(concat((1 to rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r)): _*))): _*)

  /** Value (0-15) of hex digit at 0-based char position `pos` of a hex string. */
  private def hexDigitVal(hx: Column, pos: Int): Column =
    conv(substring(hx, pos + 1, 1), 16, 10).cast("int")

  /**
   * 64-bit SimHash over a token array (with multiplicity — repeated words
   * weigh more), returned as a 16-char lowercase hex string. Bit j of the
   * result is 1 iff the sum over tokens of (+1 if bit j of md5(token) else
   * -1) is positive. One md5 per token; bit extraction is hex-digit math
   * the DuckDB oracle reproduces exactly.
   */
  def simhash64Hex(toks: Column): Column = {
    // per-token md5 hex, computed once per token
    val hashes = transform(toks, w => md5Hex(w))
    // +1/-1 for bit j (static j) of a token hash
    def signedBit(hx: Column, j: Int): Column = {
      val bit = shiftright(hexDigitVal(hx, j / 4), 3 - (j % 4)) % 2
      when(bit === 1, lit(1L)).otherwise(lit(-1L))
    }
    // accumulate 64 signed bit-counts in one pass over the token hashes
    val acc = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (a: Column, hx: Column) =>
        array((0 until 64).map(j => element_at(a, j + 1) + signedBit(hx, j)): _*))
    // assemble 16 hex chars from the sign of each 4-bit group
    val nibbleChars = (0 until 16).map { nib =>
      val v = (0 to 3)
        .map(j => when(element_at(acc, 4 * nib + j + 1) > 0, lit(1 << (3 - j))).otherwise(lit(0)))
        .reduce(_ + _)
      lower(conv(v.cast("string"), 10, 16))
    }
    concat(nibbleChars: _*)
  }

  /**
   * Bottom-k sketch of a shingle set: the k lexicographically smallest
   * md5(shingle) values joined with ','. A compact, mergeable document
   * fingerprint (bottom-k minwise sketch); identical-content docs share
   * it, and resemblance is estimable from sketch overlap.
   */
  def bottomKSketch(shingleCol: Column, k: Int): Column =
    concat_ws(",", slice(sort_array(transform(shingleCol, s => md5Hex(s))), 1, k))
}
