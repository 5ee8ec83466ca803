package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a document as `array<string>` in ONE pass —
  * the string twin of [[ShingleHashes]] for paths that need the literal
  * n-gram text (decontamination's oracle-exact matching) rather than a
  * hash.
  *
  * Replaces the interpreted `transform(sequence(…), i => concat_ws(" ",
  * slice(toks, i, n)))` HOF pipeline, which has no codegen and re-slices a
  * fresh boxed array per position — measured ~20× slower than this walk on
  * the q64 explode stage. Semantics are BIT-IDENTICAL to
  * [[graft.ext.Decontaminate.ngramsComposable]] (ExtSpec equivalence):
  * tokens are Java-regex `\s+` splits of the SPACE-only-trimmed text with
  * limit -1 ([[TextMetrics]]' tokenization); documents with fewer than `n`
  * tokens yield an empty array.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_ngrams requires string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = WordNgrams.Ws.split(input.asInstanceOf[UTF8String].trim().toString, -1)
    if (toks.length < n) WordNgrams.Empty
    else {
      val out = new Array[AnyRef](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Ws: Pattern = Tokenize.Ws // one shared \s+ definition
  private val Empty = new GenericArrayData(Array.empty[AnyRef])

  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(text), n))
}
