package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint over whitespace tokens in
  * ONE pass — `fp = fold(0, (acc, tok) => (acc*1000003 +
  * crc32(utf8(tok)) % 1000000007) % 2147483647)`.
  *
  * Why a custom Expression (same rationale as [[TextMetrics]]): the
  * composable form — `aggregate(split(trim(text)), 0L, (acc, t) =>
  * (acc*1000003 + pmod(crc32(encode(t)), 1e9+7)) % 2^31-1)` — drives an
  * interpreted higher-order fold that re-evaluates a 4-node expression tree
  * per token with boxing; on a corpus scan it costs ~6× its single-pass
  * neighbors per byte. This walks the document's bytes once, feeding each
  * token's byte range straight into a reused [[CRC32]].
  *
  * Semantics are BIT-IDENTICAL to the composable twin (equivalence-tested
  * in ExtSpec):
  *  - tokens are Java-regex `\s+` splits (limit -1) of the SPACE-only-
  *    trimmed text. `\s` without UNICODE_CHARACTER_CLASS matches exactly
  *    the ASCII set `[ \t\n\x0B\f\r]`, so token boundaries are detectable
  *    at the byte level even in multi-byte UTF-8 text (non-ASCII
  *    whitespace like U+00A0 is NOT a separator, matching the regex);
  *  - a leading/trailing separator run yields a leading/trailing EMPTY
  *    token (crc32("") = 0), as does the empty string — matching
  *    `Pattern.split(s, -1)`;
  *  - crc32 is over each token's UTF-8 bytes (Spark's `crc32(encode(...))`),
  *    reduced mod 1000000007 (crc32 is non-negative, so `pmod` ≡ `%`);
  *  - the accumulator never exceeds 2^31-1, so `acc*1000003 + h` stays
  *    below 2^51 — no Long overflow anywhere (ANSI-safe).
  */
case class DocFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"doc_fingerprint requires string, got $t")
  }

  private def isWs(b: Byte): Boolean = Tokenize.isWsByte(b)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // SPACE-only trim (UTF8String.trim / SQL trim semantics).
    var start = 0
    var end = bytes.length
    while (start < end && bytes(start) == ' ') start += 1
    while (end > start && bytes(end - 1) == ' ') end -= 1

    val crc = new CRC32()
    var fp = 0L
    def foldToken(tokStart: Int, tokEnd: Int): Unit = {
      crc.reset()
      crc.update(bytes, tokStart, tokEnd - tokStart)
      fp = (fp * 1000003L + crc.getValue % 1000000007L) % 2147483647L
    }

    // Pattern.split(s, -1) over \s+: segments between maximal separator
    // runs, keeping the empty leading/trailing segments (and [""] for "").
    var tokStart = start
    var i = start
    while (i < end) {
      if (isWs(bytes(i))) {
        foldToken(tokStart, i)
        while (i < end && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    foldToken(tokStart, end)
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

object DocFingerprint {
  def apply(text: Column): Column =
    GraftColumnBridge.column(DocFingerprint(GraftColumnBridge.expression(text)))
}
