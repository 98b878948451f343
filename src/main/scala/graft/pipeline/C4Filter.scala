package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the Limits of
 * Transfer Learning with a Unified Text-to-Text Transformer", §2.2 — the
 * public C4 corpus construction rules), the third member of the curation-gate
 * family next to the Gopher repetition gates (q39) and the composite quality
 * score (q15):
 *
 *  line level — a line survives iff it
 *    1. ends in a terminal punctuation mark (`.` `!` `?` `"`),
 *    2. has at least [[MinWordsPerLine]] whitespace words, and
 *    3. does not mention `javascript` (case-insensitive);
 *  document level — a page is dropped (first matching reason wins) when it
 *    4. contains the placeholder phrase `lorem ipsum` (case-insensitive),
 *    5. contains a curly brace `{` (code, not prose),
 *    6. contains a blocklisted word (the mechanism of C4's bad-words list;
 *       the list itself is a caller-supplied parameter, empty by default), or
 *    7. keeps fewer than [[MinLinesPerDoc]] lines after the line pass
 *       (C4's "fewer than 3 sentences" gate, with surviving lines as the
 *       sentence proxy — the batch analog of its sentence splitter).
 *
 * Everything is a Column expression over `split`/`filter`/`transform`
 * higher-order functions: one codegen pass per document, no shuffle, no UDF —
 * the same shape that lets the q39 gates run at 100 TB as a pure map.
 */
object C4Filter {

  /** C4 §2.2: "only retained lines that contained at least 5 words". */
  val MinWordsPerLine = 5

  /** C4 §2.2: "discarded any page with fewer than 3 sentences". */
  val MinLinesPerDoc = 3

  /** Non-empty trimmed lines of `text`. */
  def docLines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** The surviving lines of `text` under the three line-level rules. */
  def keptLines(text: Column): Column =
    filter(docLines(text), l => {
      val words = size(filter(split(l, "\\s+"), w => length(w) > 0))
      val terminal = l.endsWith(".") || l.endsWith("!") ||
        l.endsWith("?") || l.endsWith("\"")
      terminal && words >= MinWordsPerLine && !lower(l).contains("javascript")
    })

  /** First-match drop reason for a document (`ok` = kept). `badWords` are
    * matched as case-insensitive substrings of the page, the way C4 applied
    * its blocklist page-wide; pass tokens with their own word boundaries
    * (e.g. `" foo "`) when substring semantics are too broad. */
  def dropReason(text: Column, kept: Column,
      badWords: Seq[String] = Nil): Column = {
    val lowered = lower(text)
    val bad = badWords.foldLeft(lit(false))((acc, w) =>
      acc || lowered.contains(w.toLowerCase))
    when(lowered.contains("lorem ipsum"), "lorem_ipsum")
      .when(text.contains("{"), "brace")
      .when(bad, "bad_word")
      .when(size(kept) < MinLinesPerDoc, "too_few_lines")
      .otherwise("ok")
  }

  /** Per-document C4 cleaning report over `docs(idCol, textCol, ...)`:
    * `(idCol, total_lines, kept_lines, clean_len, reason, keep)` where
    * `clean_len` is the length of the surviving lines re-joined with `\n`
    * (the text C4 would emit for the page). One narrow projection — callers
    * that want the cleaned text itself select `array_join` of [[keptLines]]
    * directly and keep the same single-pass plan. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      badWords: Seq[String] = Nil): DataFrame = {
    val text = col(textCol)
    val kept = keptLines(text)
    val reason = dropReason(text, kept, badWords)
    docs.select(col(idCol),
      size(docLines(text)).as("total_lines"),
      size(kept).as("kept_lines"),
      length(array_join(kept, "\n")).as("clean_len"),
      reason.as("reason"),
      (reason === "ok").as("keep"))
  }
}
