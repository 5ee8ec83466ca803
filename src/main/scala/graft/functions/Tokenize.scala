package graft.functions

import java.util.regex.Pattern

/** The ONE whitespace definition every native text expression shares.
  *
  * The package's cross-expression equivalence claims (native vs composable
  * twins, simhash-over-tokens vs shingle-over-tokens, the q26/q27 oracle
  * SQL) all assume these expressions tokenize IDENTICALLY — six private
  * re-declarations of `\s+` / the `\s` character set could silently
  * desynchronize under a future edit, so the pattern and both per-unit
  * predicates live here. Java regex `\s` is exactly
  * `[ \t\n\x0B\f\r]`, which the char and byte predicates mirror (all six
  * members are ASCII, so the byte form is sound on UTF-8 input: multi-byte
  * sequences never contain bytes < 0x80).
  */
private[functions] object Tokenize {

  /** `\s+` — the token separator every splitter uses. */
  val Ws: Pattern = Pattern.compile("\\s+")

  /** Char form of `\s` (LangId's in-line scanner). */
  def isWsChar(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Byte form of `\s` over UTF-8 bytes (DocFingerprint's rolling hash). */
  def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}
