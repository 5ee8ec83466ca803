package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `xxhash64` of every DISTINCT word n-gram shingle of a document, as ONE
  * single-pass native expression returning `array<long>`.
  *
  * Bit-identical to the composable pipeline it replaces —
  * `transform(array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(split(trim(text), "\s+"), i+1, n)))), s -> xxhash64(s))` — which
  * is pure interpreted higher-order-function machinery (HOFs have no
  * codegen in Spark) and measured ~3s at sf0.1 for the shingling alone,
  * dominating every minhash query. Equivalence (including the composable
  * form's edge semantics: space-only trim, a leading empty token when the
  * text starts with non-space whitespace, a trailing empty token when it
  * ends with one, and the whole-text fallback shingle for docs shorter
  * than n) is pinned by an ExtSpec test.
  *
  * Output order is first occurrence, matching `array_distinct`.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires string, got $t")
  }

  import ShingleHashes.Ws

  override protected def nullSafeEval(input: Any): Any = {
    // trim() is SPACE-only (0x20), exactly like Spark's trim(col)
    val s = input.asInstanceOf[UTF8String].trim().toString
    val toks = Ws.split(s, -1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    def addShingle(from: Int, until: Int): Unit = {
      sb.setLength(0)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      seen.add(XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L))
    }
    if (toks.length >= n) {
      var i = 0
      while (i <= toks.length - n) { addShingle(i, i + n); i += 1 }
    } else {
      addShingle(0, toks.length)
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Same regex Spark's `split(text, "\\s+")` compiles. */
  private val Ws: Pattern = Tokenize.Ws // one shared \s+ definition

  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(text), n))
}
