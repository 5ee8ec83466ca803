package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate row for per-group top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Bounded top-k typed Aggregator: keeps the k best (score DESC, id ASC)
  * rows per group with map-side partial aggregation.
  *
  * Why an Aggregator instead of a `row_number()` window (the textbook
  * per-group top-k): the window must SHUFFLE every scored row to its
  * group's partition before ranking — for batched similarity search that
  * is corpus × queries narrow rows through the exchange, which is exactly
  * the volume a 100 TB job cannot move. This aggregate reduces to ≤ k rows
  * per group per input partition BEFORE the shuffle (classic partial-agg
  * top-k); the exchange then carries at most k·partitions rows per group,
  * not the corpus. Results are identical to the window form — the
  * comparator is a total order (score DESC, id ASC tie-break), so ties
  * resolve the same way on any partitioning; ExtSpec pins
  * window-equivalence and repartition-invariance.
  *
  * The buffer is a sorted Array (insertion into ≤ k elements): for the
  * small k of similarity search (5-100) that beats heap bookkeeping and
  * serializes cheaply between partial and final aggregation.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Array[Scored], Seq[Scored]] {
  require(k >= 1, s"k must be >= 1, got $k")

  /** Total order matching Spark's and DuckDB's DESC sort semantics for
    * doubles: NaN sorts as the LARGEST value (plain `>` would make NaN
    * never-better, leaving its placement dependent on which partition it
    * arrived from), and -0.0 equals 0.0 (`Double.compare` alone would rank
    * them, diverging from the engines' normalized comparison right at a
    * k-boundary tie). */
  private def better(a: Scored, b: Scored): Boolean = {
    val as = if (a.score == 0.0) 0.0 else a.score
    val bs = if (b.score == 0.0) 0.0 else b.score
    val c = java.lang.Double.compare(as, bs)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Array[Scored] = Array.empty

  override def reduce(buf: Array[Scored], x: Scored): Array[Scored] =
    if (buf.length >= k && better(buf(buf.length - 1), x)) buf
    else {
      val out = new Array[Scored](math.min(buf.length + 1, k))
      var placed = false
      var r = 0
      var w = 0
      while (w < out.length) {
        if (!placed && (r >= buf.length || better(x, buf(r)))) {
          out(w) = x; placed = true
        } else {
          out(w) = buf(r); r += 1
        }
        w += 1
      }
      out
    }

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] = {
    val out = new Array[Scored](math.min(a.length + b.length, k))
    var ia = 0
    var ib = 0
    var w = 0
    while (w < out.length) {
      if (ib >= b.length || (ia < a.length && better(a(ia), b(ib)))) {
        out(w) = a(ia); ia += 1
      } else {
        out(w) = b(ib); ib += 1
      }
      w += 1
    }
    out
  }

  override def finish(buf: Array[Scored]): Seq[Scored] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder[Array[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** `topK(k)` as a TypedColumn over [[Scored]] input rows. */
  def column(k: Int): TypedColumn[Scored, Seq[Scored]] = new TopKAgg(k).toColumn
}
