package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/**
 * Unicode text normalization — the canonicalization pass multilingual
 * pipelines run before hashing or tokenizing (the same bytes can spell
 * "é" two ways; dedup by md5 then silently misses the pair):
 *
 *  - `nfc`: canonical composition (NFC) via the JDK's
 *    `java.text.Normalizer` — combining sequences collapse to their
 *    precomposed forms, so byte-level hashing sees one spelling.
 *  - `stripAccents`: NFD decomposition with combining marks removed —
 *    the DuckDB `strip_accents` recipe, for accent-insensitive
 *    matching/search keys.
 *
 * Both are pure per-row functions in one typed pass (the JDK carries
 * the Unicode tables; Catalyst has no expression for them), zero
 * shuffle, null-preserving, and oracle-pinned against DuckDB's
 * `nfc_normalize`/`strip_accents` (pq63) — two independent Unicode
 * implementations agreeing byte-for-byte on the fixture.
 */
object TextNormalize {

  private[llm] def nfcJvm(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  private[llm] def stripAccentsJvm(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")

  /** The script classes [[scriptProfile]] counts, as (name, literal
    * codepoint-range character class). ASCII Latin only by design —
    * accented Latin should be [[normalize]]d first; the ranges are
    * spelled as literal characters so the identical pattern runs in
    * Java regex and RE2 (named script classes diverge between the two:
    * `\p{IsCyrillic}` vs `\p{Cyrillic}`). */
  private[llm] val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[Ѐ-ӿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "arabic" -> "[؀-ۿ]",
    "cjk" -> "[一-鿿]",
    "kana" -> "[぀-ヿ]",
    "hangul" -> "[가-힯]")

  /**
   * Per-document script profile — the charset prestage multilingual
   * routing runs before n-gram language ID ([[TextAnalysis]] pq4 scores
   * within an alphabet; a Cyrillic page under Latin profiles is
   * garbage-in): counts per script class via the length-difference
   * trick (`length(s) - length(regexp_replace(s, class, ''))` — one
   * codegen'd regex scan per class, zero shuffle, zero UDF), `digit`
   * and `other` remainders, and `dominant` = the argmax script by a
   * deterministic comparison chain (ties resolve to the earlier class
   * in [[ScriptClasses]] order; all-zero → 'none'). Null texts yield
   * ZERO counts with a NULL dominant — counts stay a non-null bigint
   * column (an engine-dependent NaN materialization of nullable counts
   * is exactly the cross-engine trap this library avoids), the null
   * dominant alone marks the no-text case.
   */
  /** The literal ranges of a "[a-bc-d…]" class pattern, parsed from
    * the pattern itself so the typed pass below can never drift from
    * the documented class definitions. */
  private def classRanges(cls: String): Array[(Int, Int)] = {
    require(cls.head == '[' && cls.last == ']', s"not a class: $cls")
    val body = cls.substring(1, cls.length - 1)
    require(body.length % 3 == 0 && body.grouped(3).forall(_.charAt(1) == '-'),
      s"not a pure range class: $cls")
    body.grouped(3).map(g => (g.charAt(0).toInt, g.charAt(2).toInt)).toArray
  }

  def scriptProfile(df: DataFrame, idCol: String, textCol: String,
      ordered: Boolean = true): DataFrame = {
    // ONE typed codepoint pass per document. The previous form ran one
    // codegen'd regexp_replace scan per class (8 scans, each allocating
    // the replaced string) and took the count as the length difference;
    // the classes are pure literal codepoint ranges, so a single loop
    // classifying each codepoint computes the identical integer counts
    // (Spark's length() counts codepoints, exactly this iteration) —
    // no float anywhere, bit-equivalence is arithmetic. The ranges are
    // parsed from the same pattern literals the oracle uses.
    val ranges = ScriptClasses.map { case (name, cls) => name -> classRanges(cls) }
    // the single-pass loop counts each codepoint in AT MOST ONE class
    // (first match wins) and checks [0-9] first; equivalence with the
    // independent per-class counts the oracle computes therefore rests
    // on the ranges being pairwise disjoint and digit-free — a future
    // overlapping class must fail HERE, not silently diverge (ADVICE
    // r21 #3)
    locally {
      val all = ranges.flatMap { case (n, rs) => rs.map(r => (n, r)) }
      all.foreach { case (n, (lo, hi)) =>
        require(hi < '0' || lo > '9',
          s"scriptProfile: class $n range [$lo,$hi] overlaps digits 0-9")
      }
      all.combinations(2).foreach {
        case Seq((na, (la, ha)), (nb, (lb, hb))) =>
          require(ha < lb || hb < la,
            s"scriptProfile: classes $na and $nb have overlapping ranges " +
              s"[$la,$ha] and [$lb,$hb] — first-match counting would " +
              "diverge from independent per-class counts")
        case _ => ()
      }
    }
    val classNames = ranges.map(_._1)
    val nClasses = ranges.length
    val rangeArr = ranges.map(_._2).toArray
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.{Encoders, Row}
    val in = df.select(col(idCol).as("doc_id"), col(textCol).cast("string"))
    val outSchema = StructType(
      Seq(in.schema.head.copy(name = "doc_id"),
        StructField("n_chars", LongType, nullable = false)) ++
      classNames.map(n => StructField(n, LongType, nullable = false)) ++
      Seq(StructField("digit", LongType, nullable = false),
        StructField("other", LongType, nullable = false),
        StructField("dominant", StringType, nullable = true)))
    in.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) {
          val out = new Array[Any](3 + nClasses + 2)
          out(0) = r.get(0)
          var i = 1
          while (i < out.length - 1) { out(i) = 0L; i += 1 }
          out(out.length - 1) = null
          Row(out.toIndexedSeq: _*)
        } else {
          val s = r.getString(1)
          val counts = new Array[Long](nClasses)
          var digit = 0L
          var total = 0L
          var i = 0
          while (i < s.length) {
            val cp = s.codePointAt(i)
            total += 1
            if (cp >= '0' && cp <= '9') digit += 1
            else {
              var c = 0
              var done = false
              while (c < nClasses && !done) {
                val rs = rangeArr(c)
                var k = 0
                while (k < rs.length && !done) {
                  if (cp >= rs(k)._1 && cp <= rs(k)._2) {
                    counts(c) += 1; done = true
                  }
                  k += 1
                }
                c += 1
              }
            }
            i += Character.charCount(cp)
          }
          var other = total - digit
          var c = 0
          while (c < nClasses) { other -= counts(c); c += 1 }
          // argmax with earliest-class tie-break: fold from the LAST
          // class up, each class taking over when count >= running best
          var domName = "none"
          var domCount = 0L
          c = nClasses - 1
          while (c >= 0) {
            if (counts(c) > 0L && counts(c) >= domCount) {
              domName = classNames(c); domCount = counts(c)
            }
            c -= 1
          }
          val out = new Array[Any](3 + nClasses + 2)
          out(0) = r.get(0)
          out(1) = total
          c = 0
          while (c < nClasses) { out(2 + c) = counts(c); c += 1 }
          out(2 + nClasses) = digit
          out(3 + nClasses) = other
          out(4 + nClasses) = domName
          Row(out.toIndexedSeq: _*)
        }
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, "doc_id"))
  }

  /** (idCol, nfc): the NFC form only — what the hot dedup/pipeline path
    * needs ([[normalize]] also pays an NFD + combining-mark regex pass
    * per document for `ascii_folded`, waste when nothing reads it). */
  def nfc(df: DataFrame, idCol: String, textCol: String,
      ordered: Boolean = true): DataFrame = {
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val outSchema = StructType(Seq(
      in.schema(in.schema.fieldIndex(idCol)),
      StructField("nfc", StringType, nullable = true)))
    in.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) Row(r.get(0), null)
        else Row(r.get(0), nfcJvm(r.getString(1)))
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }

  /** (idCol, nfc, ascii_folded): the NFC form and the accent-stripped
    * form of `textCol`; null texts stay null in both. */
  def normalize(df: DataFrame, idCol: String, textCol: String,
      ordered: Boolean = true): DataFrame = {
    val in = df.select(col(idCol), col(textCol).cast("string"))
    val outSchema = StructType(Seq(
      in.schema(in.schema.fieldIndex(idCol)),
      StructField("nfc", StringType, nullable = true),
      StructField("ascii_folded", StringType, nullable = true)))
    in.mapPartitions { rows =>
      rows.map { r =>
        if (r.isNullAt(1)) Row(r.get(0), null, null)
        else {
          val s = r.getString(1)
          Row(r.get(0), nfcJvm(s), stripAccentsJvm(s))
        }
      }
    }(Encoders.row(outSchema))
      .transform(Presented(_, ordered, idCol))
  }
}
