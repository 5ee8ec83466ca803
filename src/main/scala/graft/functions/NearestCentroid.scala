package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Index of the nearest centroid (squared-L2) for a numeric vector — the
  * assignment step of IVF / k-means, as ONE tight primitive loop per row.
  *
  * Why a custom Expression (same rationale as [[DotProduct]] /
  * [[HyperplaneLsh]]): the composable form needs k distance columns plus an
  * O(k²) `least`/`when` argmin tree, all interpreted per row; here the
  * centroid matrix is baked into the expression instance (it is broadcast
  * with the serialized plan — k·dim doubles, tiny) and the scan stays
  * shuffle-free. Ties break to the LOWEST index, so assignment is
  * deterministic on any partitioning.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "centroids must be non-empty")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires array<float|double>, got $t")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    // getFloat/getDouble read a null slot as 0.0 — the distance to every
    // centroid would be computed against a zeroed component and argmin
    // would pick a wrong-but-valid cluster with no error (the PqAdc
    // null-slot contract); validate once up front, not per centroid
    var j = 0
    while (j < n) {
      if (vec.isNullAt(j))
        throw new IllegalArgumentException(
          s"nearest_centroid: null element at index $j — vectors must be dense")
      j += 1
    }
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      // a geometry mismatch (stale centroids of another dim, wrong slice)
      // must fail loudly — a min(n, len) loop would argmin over truncated
      // distances and emit plausible-but-wrong assignments with no error
      if (cent.length != n)
        throw new IllegalArgumentException(
          s"nearest_centroid: vector dim $n != centroid dim ${cent.length} (centroid $c)")
      var dist = 0.0
      var i = 0
      val m = n
      while (i < m) {
        val v = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val d = v - cent(i)
        dist += d * d
        i += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(vec), centroids))
}
