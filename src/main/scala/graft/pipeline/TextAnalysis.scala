package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation over
 * `documents(doc_id, text, lang, ...)`. Everything is a Column expression
 * (whole-stage codegen, pushdown-friendly); language-ID additionally ships a
 * pure-Scala scorer for use inside kernels.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish token count: splits on word/number/punctuation boundaries the
    * way byte-pair pre-tokenizers do (letters runs, digit runs, single
    * punctuation marks each count). */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""), t => length(trim(t)) > 0))

  /** BPE-ish token count via match extraction (letter/digit runs + single
    * non-space symbols). Lookaround-free, so the same pattern runs under both
    * Java regex and RE2 — the DuckDB-verifiable variant of [[tokenCountBpe]]. */
  def tokenCountMatches(text: Column): Column =
    size(regexp_extract_all(text, lit("""[\p{L}\p{N}]+|[^\p{L}\p{N}\s]"""), lit(0)))

  /** Characters / alpha ratio / punct ratio / stopword ratio / mean word len
    * -> a [0,1] quality score (heuristics in the C4/Gopher-rule family). */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^\\p{L}]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val tokens = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val nTok = size(tokens).cast("double")
    val stop = size(filter(tokens, t => t.isin(stopwords: _*))).cast("double")
    val alphaRatio = when(n > 0, alpha / n).otherwise(0.0)
    val punctRatio = when(n > 0, punct / n).otherwise(0.0)
    val stopRatio = when(nTok > 0, stop / nTok).otherwise(0.0)
    val meanWordLen = when(nTok > 0, alpha / nTok).otherwise(0.0)
    // weighted composite, clamped to [0, 1]
    val raw = alphaRatio * 0.4 +
      least(stopRatio * lit(2.0), lit(1.0)) * 0.3 +
      when(punctRatio.between(0.005, 0.2), 1.0).otherwise(0.0) * 0.15 +
      when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.0) * 0.15
    least(greatest(raw, lit(0.0)), lit(1.0))
  }

  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "this", "by", "from",
    "be", "are", "was", "der", "die", "das", "und", "le", "la", "les", "et",
    "el", "los", "de", "en", "un", "une")

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed text —
    * the cheap content-identity key (DuckDB-verifiable). */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Winnowing fingerprint (rolling Rabin-Karp hash, window-minima): a
    * compact Set[Long] sketch for containment/overlap detection. Pure Scala
    * (used from typed maps / kernels). */
  def winnowing(text: String, k: Int = 8, window: Int = 16): Set[Long] = {
    val s = text.toLowerCase.replaceAll("\\s+", " ")
    if (s.length < k) return Set.empty
    val B = 1000000007L
    val hashes = new Array[Long](s.length - k + 1)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); if (i < k - 1) pow *= B; i += 1 }
    hashes(0) = h
    i = k
    while (i < s.length) {
      h = (h - s.charAt(i - k) * pow) * B + s.charAt(i)
      hashes(i - k + 1) = h
      i += 1
    }
    // window minima (classic winnowing selection)
    val out = scala.collection.mutable.Set[Long]()
    var w = 0
    while (w + window <= hashes.length) {
      var m = hashes(w); var j = 1
      while (j < window) { if (hashes(w + j) < m) m = hashes(w + j); j += 1 }
      out += m
      w += 1
    }
    if (out.isEmpty) Set(hashes.min) else out.toSet
  }

  // ----------------------------------------------------------- language ID

  /** Per-language marker profiles (tiny n-gram/stopword heuristic — the
    * classic rank-profile approach shrunk to common markers). */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is ", " that ", "ing "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", " nicht ", "sch"),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " que ", " des "),
    "es" -> Seq(" el ", " los ", " las ", " es ", " que ", " con ", "ción"),
    "pt" -> Seq(" o ", " os ", " um ", " não ", " que ", "ção", " em "),
    "ru" -> Seq(" и ", " в ", " не ", " на ", " что ", "ого", "ать"),
    "ja" -> Seq("の", "は", "を", "に", "が", "した", "です"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Languages the classifier knows, sorted. */
  def knownLanguages: Seq[String] = langMarkers.keys.toSeq.sorted

  /** Deterministic marker-saturated sample text for `lang` — guaranteed to
    * classify as `lang` (each of its 7 markers occurs >= 3 times; no other
    * language's full marker set can outscore it). Used to build
    * by-construction oracles for the agreement-matrix query. */
  def plantedText(lang: String): String = langMarkers(lang).mkString * 3

  /** Pure-Scala language classifier: best marker-hit score, "und" when no
    * marker fires. */
  def detectLanguage(text: String): String = {
    val padded = " " + text.toLowerCase + " "
    var best = "und"; var bestScore = 0
    langMarkers.foreach { case (lang, markers) =>
      var score = 0
      markers.foreach { m =>
        var idx = padded.indexOf(m)
        while (idx >= 0) { score += 1; idx = padded.indexOf(m, idx + 1) }
      }
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  /** Column variant: ONE pass over the text per marker with plain
    * `indexOf` scans inside a single UDF call — replaces the previous
    * formulation of 56 `regexp_replace` full-text passes per row (measured
    * ~30x the cost of the sibling token/quality pipelines at sf0.1).
    * Scoring is bit-identical to the old expression: non-overlapping
    * occurrence counts (what regexp_replace removal counted) and ties
    * broken by the lexicographically largest language code (what
    * `greatest` over (score, lang) structs picked). */
  def detectLanguageCol(text: Column): Column = {
    val langsSorted = langMarkers.toSeq.sortBy(_._1)
    val f = org.apache.spark.sql.functions.udf { (t: String) =>
      if (t == null) "und"
      else {
        val padded = " " + t.toLowerCase + " "
        var bestLang = ""
        var bestScore = Long.MinValue
        langsSorted.foreach { case (lang, markers) =>
          var score = 0L
          markers.foreach { m =>
            var idx = padded.indexOf(m)
            while (idx >= 0) { score += 1; idx = padded.indexOf(m, idx + m.length) }
          }
          if (score > bestScore || (score == bestScore && lang > bestLang)) {
            bestScore = score; bestLang = lang
          }
        }
        if (bestScore > 0) bestLang else "und"
      }
    }
    f(text)
  }

  // ---- Gopher/MassiveText repetition rules (Rae et al. 2021, table A1) ----
  // Per-doc metrics never shuffle; the math runs in a ONE-PASS Scala kernel
  // (the q20/q26/q38 lesson: Catalyst higher-order functions — split /
  // transform / sort_array / aggregate over per-doc arrays — evaluate
  // interpreted per element, ~3 orders of magnitude off the raw arithmetic,
  // and the old sort_array fold here was exactly that pathology). The
  // Column-expression originals survive below as `*Expr`, kept as the
  // independent oracle a fuzz test checks the kernel against.

  /** Both repetition stats in one pass over the document. */
  final case class GopherStats(dup: Double, top: Double)

  /** One-pass kernel. Semantics bit-match the `*Expr` Column originals:
    * lines = split on '\n', trim SPACES ONLY (Spark `trim` = ASCII 32),
    * drop empties; dup = 1 - distinct/total. words = lower(text) split on
    * java-regex `\s+`, drop empties; top = max bigram multiplicity /
    * (words-1). Zero for empty/one-line/one-word docs; null text stays
    * null (the UDF wrapper handles it — callers of the kernel itself get
    * zeros, matching a missing doc). */
  private[pipeline] def gopherStatsKernel(text: String): GopherStats = {
    if (text == null) return GopherStats(0.0, 0.0)
    // dup-line fraction: manual '\n' walk, no regex, no array materialized
    val seenLines = new java.util.HashSet[String]()
    var totalLines = 0
    val n = text.length
    var start = 0
    while (start <= n) {
      var end = text.indexOf('\n', start)
      if (end < 0) end = n
      var a = start; var b = end
      while (a < b && text.charAt(a) == ' ') a += 1
      while (b > a && text.charAt(b - 1) == ' ') b -= 1
      if (b > a) { totalLines += 1; seenLines.add(text.substring(a, b)): Unit }
      start = end + 1
    }
    val dup =
      if (totalLines > 0) 1.0 - seenLines.size.toDouble / totalLines.toDouble
      else 0.0
    // top-bigram fraction: tokenize the lowered text, count bigram
    // multiplicity in a hash map (== the max equal-run of the old
    // sort_array fold). Lowercasing mirrors UTF8String.toLowerCase EXACTLY
    // (verified against the 4.1.2 bytecode): a locale-independent A-Z map
    // for full-ASCII strings, else platform-default String.toLowerCase —
    // a plain no-arg toLowerCase would diverge from Spark's lower() on
    // all-ASCII text under tr/az default locales (I -> dotless ı).
    val lowered =
      if (isFullAscii(text)) lowerAscii(text)
      else text.toLowerCase
    @inline def isWs(c: Char): Boolean = // java regex \s = [ \t\n\x0B\f\r]
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    val m = lowered.length
    val counts = new java.util.HashMap[String, Int]()
    var best = 0
    var nWords = 0
    var prev: String = null
    var i = 0
    while (i < m) {
      while (i < m && isWs(lowered.charAt(i))) i += 1
      if (i < m) {
        val ws = i
        while (i < m && !isWs(lowered.charAt(i))) i += 1
        val w = lowered.substring(ws, i)
        nWords += 1
        if (prev != null) {
          val key = prev + " " + w
          val c = counts.merge(key, 1, Integer.sum)
          if (c > best) best = c
        }
        prev = w
      }
    }
    val top =
      if (nWords >= 2) best.toDouble / (nWords - 1).toDouble else 0.0
    GopherStats(dup, top)
  }

  private def isFullAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  private def lowerAscii(s: String): String = {
    var i = 0
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val a = s.toCharArray
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  // null in -> null out, like the Column originals (a null-text row must
  // keep evaluating gopherKeep to null, i.e. be DROPPED by a filter — the
  // kernel's zeros would silently flip it to kept)
  private val gopherStatsUdf =
    udf { (t: String) => if (t == null) null else gopherStatsKernel(t) }

  /** Both stats as a struct column `(dup, top)` — compute ONCE per row and
    * getField when a caller needs both (CSE dedups identical deterministic
    * UDF calls inside one projection, but sharing the struct is explicit). */
  def gopherStats(text: Column): Column = gopherStatsUdf(text)

  /** Fraction of lines that are duplicates of an earlier line:
    * 1 - distinct/total (0 for empty/one-line docs). */
  def dupLineFrac(text: Column): Column = gopherStats(text).getField("dup")

  /** Fraction of word 2-grams occupied by the single most frequent 2-gram. */
  def topBigramFrac(text: Column): Column = gopherStats(text).getField("top")

  /** The Gopher keep decision at the published thresholds: duplicate-line
    * fraction <= 0.30, top-2-gram fraction <= 0.20. */
  def gopherKeep(text: Column): Column = {
    val g = gopherStats(text)
    g.getField("dup") <= 0.30 && g.getField("top") <= 0.20
  }

  // ---- Column-expression originals, kept ONLY as the fuzz-test oracle ----

  /** Non-empty trimmed lines of a document. */
  private def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Column-expression original of [[dupLineFrac]] (fuzz-test oracle). */
  private[pipeline] def dupLineFracExpr(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) > 0,
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Column-expression original of [[topBigramFrac]] (fuzz-test oracle):
    * mode-of-array via sort_array + a single aggregate() equal-run fold. */
  private[pipeline] def topBigramFracExpr(text: Column): Column = {
    val words = filter(split(lower(text), "\\s+"), w => length(w) > 0)
    val bigrams = transform(sequence(lit(1), size(words) - 1, lit(1)),
      i => concat(element_at(words, i), lit(" "), element_at(words, i + 1)))
    val sorted = sort_array(bigrams)
    val best = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(size(words) >= 2, best.cast("double") / (size(words) - 1).cast("double"))
      .otherwise(lit(0.0))
  }
}
