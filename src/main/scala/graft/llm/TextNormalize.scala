package graft.llm

import graft.Presented
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

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
