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

/** Token count, stopword count, punctuation count, and character count of a
  * document in ONE pass — `struct<n_tokens, stops, punct, n_chars>`.
  *
  * Replaces four separate walks through interpreted machinery: a
  * `split(trim(text))` + `size`, a `filter(tokens, isin(stopwords))` HOF
  * (HOFs have no codegen), a `regexp_replace` strip + `length`, and a
  * `length`. Semantics are BIT-IDENTICAL (equivalence-tested in ExtSpec):
  *  - tokens are Java-regex `\s+` splits of the SPACE-only-trimmed text
  *    with limit -1 — including the composable form's edge tokens (a
  *    leading/trailing empty token when the trimmed text starts/ends with
  *    non-space whitespace; `""` tokenizes to one empty token);
  *  - stopword matching is case-sensitive over the exact token;
  *  - punct counts characters in `.!?,;:` over the RAW (untrimmed) text;
  *  - n_chars is the codepoint count (`length(text)` semantics).
  */
case class TextMetrics(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextMetrics.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"text_metrics requires string, got $t")
  }

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val toks = TextMetrics.Ws.split(u.trim().toString, -1)
    var stops = 0L
    var i = 0
    while (i < toks.length) {
      if (stopSet.contains(toks(i))) stops += 1
      i += 1
    }
    val raw = u.toString
    var punct = 0L
    var j = 0
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == '.' || c == '!' || c == '?' || c == ',' || c == ';' || c == ':')
        punct += 1
      j += 1
    }
    InternalRow(toks.length.toLong, stops, punct, u.numChars().toLong)
  }

  override protected def withNewChildInternal(newChild: Expression): TextMetrics =
    copy(child = newChild)
}

object TextMetrics {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("stops", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val Ws: Pattern = Tokenize.Ws // one shared \s+ definition

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.column(
      TextMetrics(GraftColumnBridge.expression(text), stopwords))
}
