package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Marker-token language ID as ONE single-pass Catalyst expression.
  *
  * Replaces the composable form — four interpreted `filter(tokens, t =>
  * t.isin(...))` HOFs plus a `lower`, a `split`, and a CJK `regexp_replace`,
  * each walking the document again — with one scan of the raw string:
  * tokenize on whitespace, lowercase each token, bump the matching
  * language's counter via a hash lookup, and count CJK codepoints, all in
  * the same loop. Per-byte cost drops ~8x (q27 was the second-worst
  * per-byte query in BENCH_r01).
  *
  * Semantics are IDENTICAL to the composable form (and the DuckDB oracle):
  *  - tokens are maximal runs of non-`\s` characters (Java regex `\s` =
  *    space, tab, LF, VT, FF, CR — deliberately NOT all Unicode whitespace,
  *    matching `split(trim(text), "\\s+")`);
  *  - a CJK codepoint in [U+4E00, U+9FFF] anywhere decides `zh` first;
  *  - otherwise the language with the most marker-token votes wins, ties
  *    break to the lexicographically GREATEST language code (the struct
  *    `array_max` comparison: votes first, then lang string);
  *  - zero votes => `unknown`.
  */
case class LangId(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lang_id requires string, got $t")
  }

  import LangId._

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val votes = new Array[Int](Langs.length)
    var cjk = false
    val sb = new java.lang.StringBuilder(16)

    def closeToken(): Unit = {
      if (sb.length > 0) {
        MultiIndex.get(sb.toString.toLowerCase(Locale.ROOT)).foreach { langs =>
          var j = 0
          while (j < langs.length) { votes(langs(j)) += 1; j += 1 }
        }
        sb.setLength(0)
      }
    }

    var i = 0
    val n = s.length
    while (i < n && !cjk) {
      val c = s.charAt(i)
      // first CJK codepoint decides the answer unconditionally — stop
      // scanning (a 1 MB zh doc otherwise pays the full tokenize +
      // lowercase + marker-probe walk for a result already known)
      if (c >= '一' && c <= '鿿') cjk = true
      else { if (isWs(c)) closeToken() else sb.append(c) }
      i += 1
    }
    closeToken()

    if (cjk) return UTF8String.fromString("zh")
    var best = -1
    var bestVotes = 0
    var l = 0
    while (l < Langs.length) {
      // >= : later (lexicographically greater) lang wins ties, matching
      // the struct array_max tie-break of the composable form
      if (votes(l) > 0 && votes(l) >= bestVotes) { best = l; bestVotes = votes(l) }
      l += 1
    }
    UTF8String.fromString(if (best < 0) "unknown" else Langs(best))
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** Language codes in ascending lexicographic order (tie-break relies on it). */
  val Langs: Array[String] = Array("de", "en", "es", "fr")

  /** Marker vocabularies — must stay in sync with the q27 oracle SQL. */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "en", "que", "por", "con"))

  /** token -> indices of every language claiming it (e.g. "la" is both fr
    * and es), so a shared token votes for all claimants. */
  private val MultiIndex: Map[String, Array[Int]] =
    Markers.toSeq
      .flatMap { case (lang, ws) => ws.map(w => (w, Langs.indexOf(lang))) }
      .groupBy(_._1)
      .map { case (w, xs) => (w, xs.map(_._2).toArray) }

  private def isWs(c: Char): Boolean = Tokenize.isWsChar(c)

  def apply(text: Column): Column =
    GraftColumnBridge.column(LangId(GraftColumnBridge.expression(text)))
}
