package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) score of a product-quantized code array
  * against a per-query lookup table — `Σ_m table[m·k + codes[m]]`, the
  * inner loop of PQ search (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): the query stays full-precision, the corpus
  * row is `m` small codes, and the distance is `m` table lookups instead
  * of a `dim`-length float walk.
  *
  * The table (m·k doubles, computed driver-side per query) rides inside
  * the expression like [[NearestCentroid]]'s centroid matrix — scan-stage
  * scoring, no join, no shuffle. Accumulation order is the fixed subvector
  * order, so scores are bit-deterministic on any layout.
  */
case class PqAdc(child: Expression, table: Seq[Double], k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && table.size % k == 0,
    s"table size ${table.size} must be a multiple of k=$k")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_adc requires array<int> codes, got $t")
  }

  @transient private lazy val tab: Array[Double] = table.toArray
  @transient private lazy val m: Int = table.size / k

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    // geometry guards — the same loud-mismatch contract Pq.encode and
    // NearestCentroid pin: codes persisted under a DIFFERENT codebook
    // (wrong m, or code values from a larger k) would otherwise read
    // entries belonging to other subvectors and return plausible-but-wrong
    // distances with no error
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: got ${codes.numElements()} codes for an m=$m, k=$k lookup " +
          "table — codes and codebook geometry must match")
    var s = 0.0
    var i = 0
    while (i < codes.numElements()) {
      // getInt on a null slot reads 0 — a valid-looking code that would
      // silently score the wrong centroid; null codes are corrupt input
      if (codes.isNullAt(i))
        throw new IllegalArgumentException(
          s"pq_adc: null code at subvector $i — codes must be non-null ints in [0,$k)")
      val c = codes.getInt(i)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"pq_adc: code $c at subvector $i is outside [0,$k) — codes were " +
            "encoded under a different codebook")
      s += tab(i * k + c)
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

object PqAdc {
  def apply(codes: Column, table: Seq[Double], k: Int): Column =
    GraftColumnBridge.column(PqAdc(GraftColumnBridge.expression(codes), table, k))
}
