package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition counters of a document in ONE pass —
  * `struct<n_lines, dup_lines, dup_line_chars, line_chars, n_words,
  * top_word_count, top_word_chars>` — the raw integers behind the public
  * duplicate-line-fraction / top-word-fraction quality filters (Rae et al.
  * 2021, "Scaling Language Models", appendix A1.1; also C4's heuristics).
  * Emitting exact longs instead of ratios keeps downstream thresholds
  * expressible as integer cross-multiplications (no ANSI divide-by-zero
  * guard, no float drift against an oracle).
  *
  * Replaces two interpreted HOF pipelines (an `aggregate` over distinct
  * lines and an O(distinct·n) `transform`+`filter` word-count scan — HOFs
  * have no codegen) with two hash-map walks. Semantics are BIT-IDENTICAL
  * to [[graft.ext.TextStats.repetitionComposable]] (equivalence-tested in
  * ExtSpec):
  *  - lines are `\n` splits of the RAW text; empty lines are ignored;
  *    a line's chars are its codepoint count (`length` semantics);
  *  - `dup_lines` / `dup_line_chars` count every occurrence beyond the
  *    first of each distinct line;
  *  - words are Java-regex `\s+` splits of the SPACE-only-trimmed text
  *    with limit -1 ([[TextMetrics]]' tokenization, edge tokens included);
  *  - the top word is the most frequent token, ties broken to the
  *    BYTE-ORDER smallest (Spark string ordering = DuckDB VARCHAR MIN);
  *    `top_word_chars = top_word_count * codepoints(top_word)`.
  */
case class RepetitionMetrics(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = RepetitionMetrics.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_metrics requires string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val raw = u.toString

    // line pass: count occurrences and codepoints per distinct non-empty line
    val lineCounts = new java.util.HashMap[String, Long]
    var nLines = 0L
    var lineChars = 0L
    raw.split("\n", -1).foreach { ln =>
      if (ln.nonEmpty) {
        nLines += 1
        lineChars += ln.codePointCount(0, ln.length)
        lineCounts.merge(ln, 1L, _ + _)
      }
    }
    var distinctLines = 0L
    var distinctChars = 0L
    lineCounts.forEach { (ln, _) =>
      distinctLines += 1
      distinctChars += ln.codePointCount(0, ln.length)
    }

    // word pass: most frequent token, byte-order tie-break
    val toks = RepetitionMetrics.Ws.split(u.trim().toString, -1)
    val wordCounts = new java.util.HashMap[String, Long]
    toks.foreach(t => wordCounts.merge(t, 1L, _ + _))
    var topCount = 0L
    var topTok: String = null
    // the current best's UTF8String only changes when the best changes —
    // caching it halves the per-tie allocations on repetitive corpora
    // (this expression's target input)
    var topTokU: UTF8String = null
    wordCounts.forEach { (tok, c) =>
      if (c > topCount) { topCount = c; topTok = tok; topTokU = null }
      else if (c == topCount) {
        if (topTokU == null) topTokU = UTF8String.fromString(topTok)
        if (UTF8String.fromString(tok).compareTo(topTokU) < 0) {
          topCount = c; topTok = tok; topTokU = null
        }
      }
    }

    InternalRow(
      nLines, nLines - distinctLines, lineChars - distinctChars, lineChars,
      toks.length.toLong, topCount,
      topCount * topTok.codePointCount(0, topTok.length))
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionMetrics =
    copy(child = newChild)
}

object RepetitionMetrics {
  val Schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_count", LongType, nullable = false),
    StructField("top_word_chars", LongType, nullable = false)))

  private val Ws: Pattern = Tokenize.Ws // one shared \s+ definition

  def apply(text: Column): Column =
    GraftColumnBridge.column(RepetitionMetrics(GraftColumnBridge.expression(text)))
}
