package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Text normalization (the "fix the bytes before anything reads them" stage
 * every webtext pipeline runs ahead of tokenization/dedup — cf. CCNet's
 * normalization and the ftfy pass in C4-style cleanups). Four rules, in
 * order:
 *
 *  1. Unicode NFC — composed forms, so "é" (e + U+0301) and "é" (U+00E9)
 *     dedup/tokenize identically.
 *  2. Strip controls: C0 except '\n'/'\t', DEL, C1 (U+0080–U+009F), plus
 *     ZWSP (U+200B) and BOM/ZWNBSP (U+FEFF). '\r' is C0, so CRLF → LF.
 *  3. Fold unicode spaces (NBSP, OGHAM, U+2000–U+200A, NNBSP, MMSP,
 *     IDEOGRAPHIC) to ASCII space.
 *  4. Collapse horizontal-whitespace runs ([ \t]+) to one space. Newlines
 *     are untouched throughout — line structure is LineDedup's input.
 *
 * Runs as ONE kernel pass per document (Dataset map — the repo's kernel
 * idiom; a per-codepoint Column/UDF chain would leave codegen anyway and
 * evaluate interpreted per char). No shuffle at all: output partitioning
 * == input partitioning, so it composes ahead of any downstream groupBy
 * without adding an exchange. Per-doc cost is O(len); the NFC quick-check
 * path in java.text.Normalizer makes already-normalized ASCII (most of a
 * web corpus) a single scan.
 *
 * The q53 oracle replays all four rules in DuckDB (nfc_normalize + RE2
 * class replaces) over a corpus planted with known mojibake — both engines
 * implement the same Unicode NFC algorithm; planted inputs keep to stable
 * codepoints so Unicode-data version skew cannot bite.
 */
object Normalize {

  private def isStrippedControl(c: Char): Boolean =
    (c < ' ' && c != '\n' && c != '\t') ||       // C0 minus LF/TAB (incl. CR)
      c == '\u007F' ||                            // DEL
      (c >= '\u0080' && c <= '\u009F') ||        // C1
      c == '\u200B' || c == '\uFEFF'             // ZWSP, BOM/ZWNBSP

  private def isHorizontalSpace(c: Char): Boolean =
    c == ' ' || c == '\t' ||
      c == '\u00A0' || c == '\u1680' ||
      (c >= '\u2000' && c <= '\u200A') ||
      c == '\u202F' || c == '\u205F' || c == '\u3000'

  /** Rules 2–4 in one char scan (rule 1 is Normalizer.normalize). A run of
    * horizontal space is held as `pendingSpace` and emitted as one ' ' at
    * the next non-space char (or end) — identical to fold-then-collapse,
    * including across stripped controls ("a <BEL> b" -> "a b"). */
  private def scrub(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (!isStrippedControl(c)) {
        if (isHorizontalSpace(c)) pendingSpace = true
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
        }
      }
      i += 1
    }
    if (pendingSpace) sb.append(' ')
    sb.toString
  }

  /** NFC + scrub; null-in, null-out. */
  def fixText(s: String): String =
    if (s == null) null
    else scrub(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** One row per input row: (idCol, text_norm, changed). `changed` is
    * false for null text (nothing to fix). */
  def normalizeDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Contracts.requireIntegral(df, idCol, "Normalize.normalizeDocs")
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val norm = fixText(text)
        (id, norm, text != null && norm != text)
      }
      .toDF(idCol, "text_norm", "changed")
  }
}
