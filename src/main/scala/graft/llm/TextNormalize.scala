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
  def scriptProfile(df: DataFrame, idCol: String, textCol: String,
      ordered: Boolean = true): DataFrame = {
    val t = col(textCol).cast("string")
    val total = length(t)
    // the length-difference spelling is DELIBERATE: `regexp_count`
    // looks cheaper but is RuntimeReplaceable into
    // size(regexp_extract_all(...)) — one allocated substring PER
    // MATCHED CHARACTER for these single-char classes, measured ~1.8x
    // slower at sf0.1 than one replaced-string allocation per class
    val counts = ScriptClasses.map { case (name, cls) =>
      name -> (total - length(regexp_replace(t, cls, "")))
    }
    val digit = total - length(regexp_replace(t, "[0-9]", ""))
    val other = counts.foldLeft(total - digit) { case (acc, (_, c)) => acc - c }
    // argmax with earliest-class tie-break: fold from the LAST class up,
    // each class taking over when its count is >= the running best
    val (domName, _) = counts.reverse.foldLeft((lit("none"), lit(0L))) {
      case ((bn, bc), (name, c)) =>
        (when(c > lit(0L) && c >= bc, lit(name)).otherwise(bn),
          when(c > lit(0L) && c >= bc, c).otherwise(bc))
    }
    def z(c: Column): Column = coalesce(c.cast("long"), lit(0L))
    df.select(Seq(col(idCol).as("doc_id"), z(total).as("n_chars")) ++
        counts.map { case (n, c) => z(c).as(n) } ++
        Seq(z(digit).as("digit"), z(other).as("other"),
          when(total.isNull, lit(null).cast("string")).otherwise(domName)
            .as("dominant")): _*)
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
