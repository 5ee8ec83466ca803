package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays (float or double),
  * with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §2.10 / builder-prompt preference order):
  * the composable form — `aggregate(zip_with(a,b,(x,y)=>x*y),0d,+)` — is a
  * nest of higher-order functions that Catalyst evaluates interpreted
  * (CodegenFallback) with per-element boxing; on an O(n²) similarity join it
  * dominates runtime. This expression compiles to a tight primitive loop.
  *
  * Semantics: elements widen to double and accumulate LEFT-TO-RIGHT — the
  * same fold order as the HOF form and as DuckDB's list_cosine_similarity
  * accumulation, so oracle results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  // A length mismatch fails LOUDLY: silently dotting min(n) components (a
  // 32-dim query against a 64-dim corpus, stale centroids of another
  // geometry) yields scaled-down but plausible scores and a wrong top-k
  // with no error — the same contract Pq.encode pins for codes.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: vector dims differ ($n vs ${y.numElements()})")
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    // getFloat/getDouble read a null slot as 0.0 — a plausible but
    // scaled-down score with no error (the PqAdc null-code contract
    // applied to the whole vector family); null elements are corrupt.
    // The scan runs as its OWN loop, gated on the schema's containsNull,
    // so the multiply loop below stays branch-free (hot path: O(pairs·dim))
    if (leftNullable) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) throw nullElement(i)
        i += 1
      }
    }
    if (rightNullable) {
      var i = 0
      while (i < n) {
        if (y.isNullAt(i)) throw nullElement(i)
        i += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  private def leftNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def rightNullable: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull
  private def nullElement(i: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"graft_dot: null element at index $i — embedding vectors must be dense")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    // null-slot scan as a SEPARATE loop, emitted only when the schema
    // admits null elements — keeps the multiply loop branch-free
    def nullScan(arr: String, nullable: Boolean, n: String): String =
      if (!nullable) ""
      else {
        val j = ctx.freshName("j")
        s"""
          |for (int $j = 0; $j < $n; $j++) {
          |  if ($arr.isNullAt($j)) {
          |    throw new IllegalArgumentException(
          |      "graft_dot: null element at index " + $j + " — embedding vectors must be dense");
          |  }
          |}
        """.stripMargin
      }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |int $n = $a.numElements();
        |if ($b.numElements() != $n) {
        |  throw new IllegalArgumentException(
        |    "graft_dot: vector dims differ (" + $n + " vs " + $b.numElements() + ")");
        |}
        |${nullScan(a, leftNullable, n)}
        |${nullScan(b, rightNullable, n)}
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += ${getter(a, elemType(left), i)} * ${getter(b, elemType(right), i)};
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level entry points (usable without any registration). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def norm2(a: Column): Column = dot(a, a)
}
