package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (BASELINE.json extension
  * surface): tokenization, token counting, quality scoring, language ID and
  * document fingerprinting over the `documents` table.
  *
  * Everything is a codegen-friendly column expression (no UDFs): at 100 TB
  * these run embarrassingly parallel inside the parquet scan stage with zero
  * shuffle, so throughput is IO-bound.
  */
object TextStats {

  /** Whitespace tokenization. `trim` first so leading/trailing space cannot
    * produce empty edge tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token/stopword/punctuation/character counts as ONE single-pass native
    * struct (`graft.functions.TextMetrics`): `n_tokens, stops, punct,
    * n_chars`. Query paths should select this once and derive ratios from
    * the fields in a following projection — one document walk instead of
    * one per measure (the HOF stopword filter alone has no codegen).
    * Bit-identical to the composable forms (ExtSpec equivalence test). */
  def metrics(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    graft.functions.TextMetrics(text, stopwords)

  def tokenCount(text: Column): Column = metrics(text).getField("n_tokens")

  /** The classic chars/4 BPE estimate used when no tokenizer is available. */
  def estBpeTokens(text: Column): Column = ceil(length(text) / 4.0)

  /** GPT2-style pre-tokenizer regex (contractions | letter runs | digit
    * runs | punctuation runs | whitespace runs — the BPE-ish split used
    * when counting LLM tokens without a vocab). */
  val BpeRegex: String =
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pre-tokenizer piece count under [[BpeRegex]]. */
  def bpeRegexTokens(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeRegex), lit(0))).cast("long")

  /** Punctuation count (chars in `.!?,;:`), via [[metrics]]. */
  def punctCount(text: Column): Column = metrics(text).getField("punct")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(text: Column, stopwords: Seq[String] = EnglishStopwords): Column =
    metrics(text, stopwords).getField("stops")

  /** Heuristic quality score in the spirit of length/punct/stopword-ratio
    * filters (C4/Gopher-style rules): stopword density minus punctuation
    * density. Arithmetic shape kept identical to the oracle SQL. Prefer
    * selecting [[metrics]] once and deriving the ratio from its fields in
    * hot query paths — this convenience form references the struct four
    * times in one expression. */
  def qualityScore(text: Column): Column = {
    val m = metrics(text)
    // ratios guarded to NULL on token-less/empty docs: Spark 4.1 ANSI
    // raises DIVIDE_BY_ZERO for DOUBLE division too, so the unguarded
    // form ABORTS the job on the first empty document
    when(m.getField("n_tokens") > 0,
      m.getField("stops") / m.getField("n_tokens")) -
      when(m.getField("n_chars") > 0,
        m.getField("punct") / m.getField("n_chars"))
  }

  /** Per-language stopword/marker sets for the n-gram-free language-ID
    * heuristic. Covers the langs present in the documents table. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "que", "por", "con"))

  /** Language ID: vote by marker-token hits per language; CJK codepoint ratio
    * decides `zh` first. Ties break to the lexicographically greatest
    * language among max-vote entries.
    *
    * Routed through the single-pass native [[graft.functions.LangId]]
    * expression: one walk of the raw string (tokenize + lowercase + vote +
    * CJK detect in the same loop) instead of 4 interpreted `filter` HOFs +
    * `lower` + `split` + `regexp_replace`, each re-walking the document.
    * Semantics are identical (see [[langGuessComposable]] and the
    * equivalence test in ExtSpec). */
  def langGuess(text: Column): Column = graft.functions.LangId(text)

  /** The original composable form of [[langGuess]] — kept as the
    * reference-semantics twin for equivalence testing of the native
    * expression. */
  def langGuessComposable(text: Column): Column = {
    val toks = tokens(lower(text))
    val cjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
    val votes = LangMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(size(filter(toks, t => t.isin(ws: _*))).as("votes"), lit(lang).as("lang"))
    }
    // array_max on (votes, lang) structs picks highest vote count; the struct
    // comparison tie-breaks on the lang string, so make order explicit:
    val best = array_max(array(votes: _*))
    when(cjk > 0, lit("zh"))
      .when(best.getField("votes") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  /** Polynomial rolling-hash fingerprint over tokens (content-defined doc
    * fingerprint). Modulus keeps the accumulator bounded (ANSI-safe).
    *
    * Routed through the single-pass native [[graft.functions.DocFingerprint]]
    * expression: one walk of the document's bytes feeding a reused CRC32,
    * instead of an interpreted `aggregate` HOF re-evaluating a boxed
    * crc32/encode/pmod tree per token. Bit-identical to
    * [[fingerprintComposable]] (equivalence test in ExtSpec). */
  def fingerprint(text: Column): Column = graft.functions.DocFingerprint(text)

  /** The original composable form of [[fingerprint]] — kept as the
    * reference-semantics twin for equivalence testing of the native
    * expression. */
  def fingerprintComposable(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => (acc * 1000003L + pmod(crc32(encode(t, "UTF-8")), lit(1000000007L))) % 2147483647L)

  /** Gopher-style repetition counters (duplicate-line and top-word
    * repetition) as ONE single-pass native struct
    * ([[graft.functions.RepetitionMetrics]]): `n_lines, dup_lines,
    * dup_line_chars, line_chars, n_words, top_word_count, top_word_chars`.
    * Exact longs, so the public thresholds ("duplicate lines hold >30% of
    * the characters", "top word is >20% of the tokens") are integer
    * cross-multiplications — no divide-by-zero guard, no float drift.
    * Bit-identical to [[repetitionComposable]] (ExtSpec equivalence). */
  def repetition(text: Column): Column = graft.functions.RepetitionMetrics(text)

  /** The composable reference-semantics twin of [[repetition]] — HOF
    * pipelines over line/token arrays (the word scan is O(distinct·n);
    * the native form exists because of it). */
  def repetitionComposable(text: Column): Column = {
    val lines = filter(split(text, "\n", -1), l => length(l) > lit(0))
    val uniqLines = array_distinct(lines)
    val lineChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l).cast("long"))
    val distinctChars =
      aggregate(uniqLines, lit(0L), (acc, l) => acc + length(l).cast("long"))
    val toks = tokens(text)
    // array_min over struct(-count, token): highest count first, ties to
    // the byte-order smallest token — RepetitionMetrics' tie-break
    val best = array_min(transform(array_distinct(toks), t =>
      struct((-size(filter(toks, x => x === t))).cast("long").as("negc"),
        t.as("tok"))))
    val topCount = -best.getField("negc")
    struct(
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(uniqLines)).cast("long").as("dup_lines"),
      (lineChars - distinctChars).as("dup_line_chars"),
      lineChars.as("line_chars"),
      size(toks).cast("long").as("n_words"),
      topCount.as("top_word_count"),
      (topCount * length(best.getField("tok"))).as("top_word_chars"))
  }
}
